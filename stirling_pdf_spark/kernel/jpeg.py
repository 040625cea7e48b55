"""Baseline JPEG codec, pure stdlib + numpy (no codec libraries).

The reference hands image bytes around opaquely (base64 in its JSON
export, PdfJsonImageElement.java:15-33) and leans on javax.imageio for
the actual decode; this container has no codec libs, so the decode
stage implements ITU-T T.81 baseline sequential DCT directly:

  decoder (``decode``): SOI / APPn / COM / DQT / SOF0 / DHT / DRI /
  SOS / RSTn / EOI marker walk, canonical Huffman decode with 0xFF00
  byte-unstuffing, DC-difference prediction with restart-interval
  resets, run-length AC with EOB/ZRL, dequantize + dezigzag, float
  separable IDCT (numpy), level shift, and YCbCr->RGB for 3-component
  scans. Supported: 8-bit baseline (SOF0), 1 component (grayscale) or
  3 components with 1x1 sampling (4:4:4). Progressive (SOF2) and
  subsampled chroma raise NotImplementedError — honest scope, the
  decode itself is real entropy + transform reconstruction.

  encoder (``encode_gray`` / ``encode_rgb444``): the matching baseline
  writer (flat quantization table, Annex K luminance Huffman tables
  for every component, optional restart intervals). It exists to make
  decoder fixtures: with a flat quant table of 16 and per-block
  CONSTANT pixel values at even levels, forward DCT yields a DC-only
  block whose quantized coefficient reconstructs the input exactly
  (F00 = 8*(v-128) is divisible by q=16 when v is even), so
  encode->decode is bit-identical and a SQL oracle can predict decoded
  pixels closed-form. General content round-trips within the usual
  lossy tolerance (pinned against an independent reference IDCT in
  tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# ITU T.81 Annex K.3 luminance Huffman tables (the standard baseline
# tables every encoder ships): (bits[1..16] counts, symbol values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

FLAT_QUANT = 16  # fixture quant step; see module docstring


def _idct_matrix() -> np.ndarray:
    """A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); IDCT(F) = A.T @ F @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = (c / 2.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _idct_matrix()


def idct_2d(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def dct_2d(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# --------------------------------------------------------------- decoder

class _HuffTable:
    """Canonical Huffman decode table from (bits, vals): codes are
    assigned in value order within ascending code length (T.81 C.2)."""

    __slots__ = ("lookup",)

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker. ``restart()`` consumes an
    expected RSTn marker and clears the bit buffer (T.81 E.2.4)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede
            # a marker code — skip them so the byte after the run
            # decides stuffed-zero vs marker
            while nxt == 0xFF:
                self.pos += 1
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("unexpected restart marker")
            else:
                raise ValueError("marker inside entropy stream")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        self.buf = 0
        self.nbits = 0
        d = self.data
        # optional 0xFF fill bytes may precede the RSTn (T.81 B.1.1.2)
        while (self.pos + 1 < len(d) and d[self.pos] == 0xFF
                and d[self.pos + 1] == 0xFF):
            self.pos += 1
        if (self.pos + 1 >= len(d) or d[self.pos] != 0xFF
                or not 0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("missing restart marker")
        self.pos += 2

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to a signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG -> (width, height, n_components, pixel bytes).
    Grayscale returns luma bytes; 3-component 4:4:4 returns interleaved
    RGB. Raises ValueError on malformed streams, NotImplementedError on
    progressive/subsampled/12-bit inputs."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    w = h = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    scan: list[tuple[int, int, int]] = []        # (comp index, dc id, ac id)
    data_start = -1
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2: skip optional 0xFF fill bytes before the code
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        m = payload[pos + 1]
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if pos + 2 + seglen > len(payload):
            raise ValueError("truncated marker segment")
        seg = payload[pos + 4:pos + 2 + seglen]
        if m == 0xDB:                                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros((8, 8))
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[i + 1 + k]
                qt[tq] = tbl
                i += 65
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline SOF0 is supported")
        elif m == 0xC0:                                 # SOF0
            prec, h, w = seg[0], *struct.unpack_from(">HH", seg, 1)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            nc = seg[5]
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if (hs, vs) != (1, 1):
                    raise NotImplementedError("subsampled chroma")
                comps.append((cid, hs, vs, tq))
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component scan")
        elif m == 0xC4:                                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif m == 0xDD:                                 # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:                                 # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(
                    (i for i, cc in enumerate(comps) if cc[0] == cid),
                    None)
                if idx is None:
                    # StopIteration would escape the decode-stage
                    # generator as a PEP-479 RuntimeError and kill the
                    # whole Arrow batch; malformed scans must stay a
                    # per-row ValueError
                    raise ValueError(f"SOS references unknown component "
                                     f"{cid}")
                scan.append((idx, tt >> 4, tt & 0x0F))
            data_start = pos + 2 + seglen
            break
        # APPn / COM / others: skip
        pos += 2 + seglen
    if data_start < 0 or not comps:
        raise ValueError("missing SOS/SOF0")

    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
    reader = _BitReader(payload, data_start)
    pred = [0] * len(comps)
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, dc_id, ac_id in scan:
                dc_tab = huff.get((0, dc_id))
                ac_tab = huff.get((1, ac_id))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("scan references undeclared "
                                     "Huffman table")
                coef = np.zeros((8, 8))
                t = reader.decode(dc_tab)
                diff = _extend(reader.bits(t), t) if t else 0
                pred[ci] += diff
                coef[0, 0] = pred[ci]
                k = 0
                while k < 63:
                    rs = reader.decode(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if rs == 0x00:                       # EOB
                        break
                    if rs == 0xF0:                       # ZRL
                        k += 16
                        continue
                    k += r + 1
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    coef[ZIGZAG[k]] = _extend(reader.bits(s), s)
                qtab = qt.get(comps[ci][3])
                if qtab is None:
                    raise ValueError("component references undeclared "
                                     "quantization table")
                px = idct_2d(coef * qtab) + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = px
            mcu += 1
    planes = [np.clip(np.round(p[:h, :w]), 0, 255) for p in planes]
    if len(comps) == 1:
        return w, h, 1, planes[0].astype(np.uint8).tobytes()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255) for ch in (r, g, b)], axis=-1
    )
    return w, h, 3, rgb.astype(np.uint8).tobytes()


# --------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)           # pad with 1-bits (T.81 F.1.2.3)

    def marker(self, m: int) -> None:
        self.flush()
        self.out += bytes((0xFF, m))


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _huff_codes(DC_LUM_BITS, DC_LUM_VALS)
_AC_CODES = _huff_codes(AC_LUM_BITS, AC_LUM_VALS)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, qcoef: np.ndarray, pred: int) -> int:
    dc = int(qcoef[0, 0])
    diff = dc - pred
    t = _category(diff)
    code, n = _DC_CODES[t]
    bw.write(code, n)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 0
    for k in range(1, 64):
        if int(qcoef[ZIGZAG[k]]):
            last = k
    for k in range(1, last + 1):
        v = int(qcoef[ZIGZAG[k]])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = _AC_CODES[0xF0]
            bw.write(code, n)
            run -= 16
        s = _category(v)
        code, n = _AC_CODES[(run << 4) | s]
        bw.write(code, n)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, n = _AC_CODES[0x00]
        bw.write(code, n)
    return dc


def _headers(w: int, h: int, ncomp: int, quant: int,
             restart_interval: int) -> bytearray:
    out = bytearray(b"\xFF\xD8")                        # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)              # APP0
    zz = bytes(quant for _ in range(64))
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + zz   # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes((c + 1, 0x11, 0))                  # 1x1 sampling, Tq 0
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, DC_LUM_BITS, DC_LUM_VALS),
                           (1, AC_LUM_BITS, AC_LUM_VALS)):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp]) + b"".join(
        bytes((c + 1, 0x00)) for c in range(ncomp)
    ) + b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    return out


def _plane_blocks(plane: np.ndarray, w: int, h: int) -> np.ndarray:
    """Edge-replicate to multiples of 8."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    full = np.empty((bh * 8, bw * 8))
    full[:h, :w] = plane
    full[h:, :w] = plane[h - 1:h, :]
    full[:, w:] = full[:, w - 1:w]
    return full


def _encode_planes(w: int, h: int, planes: list[np.ndarray], quant: int,
                   restart_interval: int) -> bytes:
    out = _headers(w, h, len(planes), quant, restart_interval)
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    full = [_plane_blocks(p, w, h) for p in planes]
    writer = _BitWriter()
    pred = [0] * len(planes)
    mcu = 0
    rst = 0
    for by in range(bh_):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.marker(0xD0 + rst % 8)
                rst += 1
                pred = [0] * len(planes)
            for ci, plane in enumerate(full):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                qcoef = np.round(dct_2d(blk) / quant)
                pred[ci] = _encode_block(writer, qcoef, pred[ci])
            mcu += 1
    writer.flush()
    return bytes(out) + bytes(writer.out) + b"\xFF\xD9"


def encode_gray(w: int, h: int, pixels: bytes, quant: int = FLAT_QUANT,
                restart_interval: int = 0) -> bytes:
    """Grayscale baseline JPEG from w*h luma bytes (row-major)."""
    plane = np.frombuffer(pixels, np.uint8).astype(float).reshape(h, w)
    return _encode_planes(w, h, [plane], quant, restart_interval)


def encode_rgb444(w: int, h: int, rgb: bytes, quant: int = FLAT_QUANT,
                  restart_interval: int = 0) -> bytes:
    """4:4:4 color baseline JPEG from w*h RGB triples."""
    px = np.frombuffer(rgb, np.uint8).astype(float).reshape(h, w, 3)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
    return _encode_planes(w, h, planes, quant, restart_interval)
