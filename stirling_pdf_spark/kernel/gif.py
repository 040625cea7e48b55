"""GIF codec, pure stdlib (GIF87a/89a, LZW).

Closes another honestly-stubbed decode format: GIF's image data is
LZW-compressed palette indices — fully decodable without codec
libraries. The decoder walks header / logical screen descriptor /
global color table / 89a extension blocks (skipped) / image
descriptor, then runs the GIF LZW variant (LSB-first bit packing,
variable code width from min+1 up to 12 bits, CLEAR resets, EOI) and
maps indices through the active color table to RGB bytes. Interlaced
images and local-color-table-less streams with no GCT raise — honest
scope, the decode itself is real dictionary reconstruction.

The encoder exists for fixtures and round-trip tests: a real LZW
compressor (code table growth, width bumps, 12-bit cap with CLEAR),
256-entry global color table. GIF is lossless, so encode->decode is
bit-exact for ANY content and the corpus oracle can state decoded
pixel bytes closed-form.
"""

from __future__ import annotations

import struct

MAX_CODE_WIDTH = 12


def _gray_palette() -> list[tuple[int, int, int]]:
    return [(i, i, i) for i in range(256)]


# --------------------------------------------------------------- decoder

class _LsbReader:
    """LSB-first bit reader over the concatenated data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.buf & ((1 << width) - 1)
        self.buf >>= width
        self.nbits -= width
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LsbReader(data)
    out = bytearray()

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code is None:
            raise ValueError("truncated LZW stream")
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("invalid LZW code")
        out += entry
        if prev is not None and len(table) < (1 << MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended before the raster filled")
    return bytes(out[:n_pixels])


def decode(payload: bytes) -> tuple[int, int, bytes]:
    """GIF -> (width, height, RGB bytes of the FIRST image)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: list[tuple[int, int, int]] | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos:pos + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("truncated global color table")
        gct = [tuple(raw[i:i + 3]) for i in range(0, 3 * n, 3)]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:                       # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                     # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated image descriptor")
            _l, _t, w, h, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF")
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                raw = payload[pos:pos + 3 * n]
                if len(raw) < 3 * n:
                    raise ValueError("truncated local color table")
                table = [tuple(raw[i:i + 3]) for i in range(0, 3 * n, 3)]
                pos += 3 * n
            if table is None:
                raise ValueError("no color table")
            if pos >= len(payload):
                raise ValueError("missing LZW minimum code size")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("invalid LZW minimum code size")
            chunks = []
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                chunk = payload[pos + 1:pos + 1 + ln]
                if len(chunk) < ln:
                    raise ValueError("truncated data sub-block")
                chunks.append(chunk)
                pos += 1 + ln
            indices = _lzw_decode(min_code, b"".join(chunks), w * h)
            # vectorized palette mapping (byte-identical to the
            # per-pixel loop; same error on an out-of-range index)
            import numpy as np

            idx = np.frombuffer(indices, np.uint8)
            if idx.size and int(idx.max()) >= len(table):
                raise ValueError("palette index out of range")
            pal = np.asarray(table, np.uint8)
            return w, h, pal[idx].tobytes()
        elif b == 0x3B:                     # trailer
            break
        else:
            raise ValueError(f"unknown block 0x{b:02X}")
    raise ValueError("no image data")


# --------------------------------------------------------------- encoder

def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    def reset():
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = reset()
    emit(clear, width)
    prev = b""
    for ib in indices:
        b = bytes([ib])
        if prev + b in table:
            prev = prev + b
            continue
        emit(table[prev], width)
        if next_code < (1 << MAX_CODE_WIDTH):
            table[prev + b] = next_code
            if next_code == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table, next_code, width = reset()
        prev = b
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def encode_gif(w: int, h: int, indices: bytes,
               palette: list[tuple[int, int, int]] | None = None) -> bytes:
    """GIF87a with a 256-entry global color table (default: grayscale
    identity) and one image."""
    if len(indices) != w * h:
        raise ValueError("index count != w*h")
    palette = palette or _gray_palette()
    if len(palette) != 256:
        raise ValueError("palette must have 256 entries")
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)                            # LZW minimum code size
    data = _lzw_encode(8, indices)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
