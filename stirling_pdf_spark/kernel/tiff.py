"""Baseline TIFF 6.0 codec — stdlib only, both byte orders, strips,
uncompressed + PackBits.

The reference treats TIFF as one of the image formats its extraction
and conversion surface accepts (Stirling-PDF's image pipeline routes
TIFF through javax.imageio / its `ImageProcessingUtils`; the
img-to-pdf controller advertises image/tiff among the accepted
uploads). This sandbox has no imageio, so — same policy as
kernel/jpeg.py and kernel/gif.py — the container is parsed for real
from the TIFF 6.0 specification (public Adobe spec, 1992): header
(II/MM + magic 42), IFD entry walk, strip assembly via
StripOffsets/StripByteCounts/RowsPerStrip, PackBits (spec §9)
decompression. Scope is the baseline profile this corpus emits:
8-bit grayscale (PhotometricInterpretation 0/1) and 8-bit RGB
(PhotometricInterpretation 2), Compression 1 (none) or 32773
(PackBits), one sample plane (PlanarConfiguration 1). Everything
else (LZW/JPEG-in-TIFF, tiles, 16-bit, palette) raises
NotImplementedError with the reason — decode_images turns that into
a per-row null + reason, never a batch failure.
"""

from __future__ import annotations

import struct

# IFD tag ids (TIFF 6.0 §8)
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_values(buf: bytes, end: str, typ: int, count: int,
                 value_field: bytes) -> list[int]:
    """Decode an IFD entry's value list (inline when it fits in the
    4-byte value slot, else via offset indirection)."""
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise NotImplementedError(f"tiff: IFD value type {typ}")
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(end + "I", value_field)
        if off + total > len(buf):
            raise ValueError("tiff: IFD value overruns file")
        raw = buf[off:off + total]
    if typ == 3:
        return list(struct.unpack(end + "H" * count, raw))
    if typ == 4:
        return list(struct.unpack(end + "I" * count, raw))
    if typ == 1:
        return list(raw)
    raise NotImplementedError(f"tiff: unsupported value type {typ}")


def unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits decompression (TIFF 6.0 §9): control byte n in 0..127
    copies n+1 literal bytes; n in -127..-1 repeats the next byte
    1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    n_data = len(data)
    while i < n_data and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run
            if i + n + 1 > n_data:
                raise ValueError("tiff: packbits literal overruns strip")
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:  # replicate run of 257 - n
            if i >= n_data:
                raise ValueError("tiff: packbits replicate missing byte")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) != expected:
        raise ValueError(
            f"tiff: packbits yielded {len(out)} bytes, want {expected}")
    return bytes(out)


def packbits(data: bytes) -> bytes:
    """PackBits compression (for the deterministic fixtures): greedy —
    replicate runs of >= 2, literal runs capped at 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length of identical bytes
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal run: until a >=2 repeat starts or 128 bytes
        j = i + 1
        while (j < n and j - i < 128
               and not (j + 1 < n and data[j + 1] == data[j])):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _header(buf: bytes) -> tuple[str, int]:
    """Validate the 8-byte header; return (struct endianness prefix,
    first IFD offset)."""
    if len(buf) < 8:
        raise ValueError("tiff: truncated header")
    order = buf[:2]
    if order == b"II":
        end = "<"
    elif order == b"MM":
        end = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack(end + "HI", buf[2:8])
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    return end, ifd_off


def _decode_ifd(buf: bytes, end: str,
                ifd_off: int) -> tuple[int, int, int, bytes, int]:
    """Decode one IFD's image; return (width, height, channels,
    pixels, next-IFD offset — 0 terminates the chain, TIFF 6.0 §2)."""
    if ifd_off + 2 > len(buf):
        raise ValueError("tiff: IFD offset overruns file")
    (n_entries,) = struct.unpack(end + "H", buf[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(buf):
            raise ValueError("tiff: truncated IFD entry")
        tag, typ, count = struct.unpack(end + "HHI", buf[pos:pos + 8])
        tags[tag] = _read_values(buf, end, typ, count, buf[pos + 8:pos + 12])
        pos += 12
    if pos + 4 > len(buf):
        raise ValueError("tiff: truncated next-IFD pointer")
    (next_off,) = struct.unpack(end + "I", buf[pos:pos + 4])

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if vals is None:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        return vals[0]

    w = one(_IMAGE_WIDTH)
    h = one(_IMAGE_LENGTH)
    compression = one(_COMPRESSION, 1)
    photometric = one(_PHOTOMETRIC)
    spp = one(_SAMPLES_PER_PIXEL, 1)
    rows_per_strip = one(_ROWS_PER_STRIP, h)
    planar = one(_PLANAR_CONFIG, 1)
    bits = tags.get(_BITS_PER_SAMPLE, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"tiff: {bits} bits/sample (8 only)")
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"tiff: compression {compression} (none/PackBits only)")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"tiff: photometric {photometric} (gray/RGB only)")
    if photometric == 2 and spp < 3:
        raise ValueError("tiff: RGB with SamplesPerPixel < 3")
    if planar != 1:
        raise NotImplementedError("tiff: planar configuration 2")
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: bad strip tables")

    row_bytes = w * spp
    out = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(buf):
            raise ValueError("tiff: strip overruns file")
        strip = buf[off:off + cnt]
        n_rows = min(rows_per_strip, remaining_rows)
        expected = n_rows * row_bytes
        if compression == 32773:
            strip = unpackbits(strip, expected)
        if len(strip) < expected:
            raise ValueError("tiff: short strip")
        out += strip[:expected]
        remaining_rows -= n_rows
    if remaining_rows > 0:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")
    px = bytes(out)
    if photometric == 0:  # WhiteIsZero: invert to BlackIsZero convention
        px = bytes(255 - b for b in px)
    return w, h, spp, px, next_off


def decode(buf: bytes) -> tuple[int, int, int, bytes]:
    """Parse a baseline TIFF's FIRST page; return (width, height,
    channels, interleaved 8-bit pixel bytes row-major)."""
    end, ifd_off = _header(buf)
    w, h, spp, px, _next = _decode_ifd(buf, end, ifd_off)
    return w, h, spp, px


def decode_pages(buf: bytes,
                 max_pages: int = 1000) -> list[tuple[int, int, int, bytes]]:
    """Walk the IFD chain of a multi-page TIFF (the layout PDFBox's
    imageToPdf consumes one page per frame — PdfUtils.java:439-531);
    return [(width, height, channels, pixels), ...] in chain order.
    Cycles / runaway chains are cut at ``max_pages``."""
    end, ifd_off = _header(buf)
    pages: list[tuple[int, int, int, bytes]] = []
    seen: set[int] = set()
    while ifd_off != 0:
        if ifd_off in seen:
            raise ValueError("tiff: IFD chain cycle")
        if len(pages) >= max_pages:
            raise ValueError(f"tiff: more than {max_pages} IFDs")
        seen.add(ifd_off)
        w, h, spp, px, ifd_off = _decode_ifd(buf, end, ifd_off)
        pages.append((w, h, spp, px))
    return pages


def _encode_page(end: str, base: int, w: int, h: int, px: bytes,
                 channels: int, compression: int,
                 rows_per_strip: int | None) -> tuple[bytes, int, int]:
    """Lay out one page (strip data + value arrays + IFD) starting at
    absolute file offset ``base``; return (blob, absolute IFD offset,
    absolute offset of the IFD's next-pointer field) so callers can
    chain pages."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(px) != w * h * channels:
        raise ValueError("pixel buffer size mismatch")
    if compression not in (1, 32773):
        raise ValueError("compression must be 1 or 32773")
    rps = rows_per_strip or h
    row_bytes = w * channels

    strips: list[bytes] = []
    r = 0
    while r < h:
        n_rows = min(rps, h - r)
        raw = px[r * row_bytes:(r + n_rows) * row_bytes]
        strips.append(packbits(raw) if compression == 32773 else raw)
        r += n_rows

    # layout: <base> | strip data | [bps values for RGB] |
    #         [strip offset/count arrays if > 1 strip] | IFD
    pos = base
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = b""
    bps_off = pos
    if channels == 3:
        extra += struct.pack(end + "HHH", 8, 8, 8)
        pos += 6
    offs_off = counts_off = 0
    if len(strips) > 1:
        offs_off = pos
        extra += struct.pack(end + "I" * len(strips), *strip_offsets)
        pos += 4 * len(strips)
        counts_off = pos
        extra += struct.pack(end + "I" * len(strips),
                             *[len(s) for s in strips])
        pos += 4 * len(strips)
    ifd_off = pos

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack(end + "HHII", tag, typ, count, value)

    entries = [
        entry(_IMAGE_WIDTH, 4, 1, w),
        entry(_IMAGE_LENGTH, 4, 1, h),
        (entry(_BITS_PER_SAMPLE, 3, 3, bps_off) if channels == 3
         else struct.pack(end + "HHI", _BITS_PER_SAMPLE, 3, 1)
         + struct.pack(end + "HH", 8, 0)),
        entry(_COMPRESSION, 3, 1, compression)[:8]
        + struct.pack(end + "HH", compression, 0),
        struct.pack(end + "HHI", _PHOTOMETRIC, 3, 1)
        + struct.pack(end + "HH", 2 if channels == 3 else 1, 0),
        (entry(_STRIP_OFFSETS, 4, len(strips), offs_off)
         if len(strips) > 1
         else entry(_STRIP_OFFSETS, 4, 1, strip_offsets[0])),
        struct.pack(end + "HHI", _SAMPLES_PER_PIXEL, 3, 1)
        + struct.pack(end + "HH", channels, 0),
        entry(_ROWS_PER_STRIP, 4, 1, rps),
        (entry(_STRIP_BYTE_COUNTS, 4, len(strips), counts_off)
         if len(strips) > 1
         else entry(_STRIP_BYTE_COUNTS, 4, 1, len(strips[0]))),
    ]
    # SHORT-typed single values need the value packed in the low half
    # of the 4-byte slot per byte order — rebuild compression entry
    # correctly (the slice above was a placeholder)
    entries[3] = (struct.pack(end + "HHI", _COMPRESSION, 3, 1)
                  + struct.pack(end + "HH", compression, 0))

    ifd = struct.pack(end + "H", len(entries)) + b"".join(entries) \
        + struct.pack(end + "I", 0)
    next_ptr_off = ifd_off + len(ifd) - 4
    return b"".join(strips) + extra + ifd, ifd_off, next_ptr_off


def encode_tiff(w: int, h: int, px: bytes, channels: int = 1,
                compression: int = 1, rows_per_strip: int | None = None,
                byte_order: str = "II") -> bytes:
    """Emit a VALID single-page baseline TIFF for the deterministic
    fixtures: 8-bit gray (channels=1) or RGB (channels=3), Compression
    1 or 32773 (PackBits), multiple strips when rows_per_strip < h, II
    or MM byte order. Round-trips bit-exactly through decode() — both
    compressions are lossless."""
    return encode_tiff_multi([(w, h, px, channels)],
                             compression=compression,
                             rows_per_strip=rows_per_strip,
                             byte_order=byte_order)


def encode_tiff_multi(pages: list[tuple[int, int, bytes, int]],
                      compression: int = 1,
                      rows_per_strip: int | None = None,
                      byte_order: str = "II") -> bytes:
    """Emit a VALID multi-page baseline TIFF: ``pages`` is a list of
    (width, height, pixels, channels); IFDs are chained in list order
    via each IFD's next pointer (TIFF 6.0 §2). Round-trips bit-exactly
    through decode_pages()."""
    if not pages:
        raise ValueError("at least one page required")
    end = "<" if byte_order == "II" else ">"
    out = bytearray(byte_order.encode() + struct.pack(end + "HI", 42, 0))
    prev_ptr = 4  # header's first-IFD offset field
    for (w, h, px, channels) in pages:
        base = len(out)
        blob, ifd_off, next_ptr = _encode_page(
            end, base, w, h, px, channels, compression, rows_per_strip)
        # patch the previous chain pointer to this page's IFD
        out[prev_ptr:prev_ptr + 4] = struct.pack(end + "I", ifd_off)
        out += blob
        prev_ptr = next_ptr
    return bytes(out)
