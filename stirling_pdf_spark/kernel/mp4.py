"""ISO-BMFF (MP4) box parser — video metadata probe + fixture encoder.

Video lands in a multimodal corpus as opaque ``binary`` payloads;
frame DECODE needs real codec libraries (H.264 et al.) and stays
honestly out of scope (SCOPE.md), but the CONTAINER is fully
parseable from the public spec (ISO/IEC 14496-12) with the standard
library, and container metadata — duration, track layout, visual
dimensions, audio sample rate — is exactly what a 100-TB sweep's
probe stage extracts (the ffprobe-shaped step every video pipeline
runs before deciding what to sample).

Implemented, spec-conformant:

  * box walk: [size:4][type:4]; size == 1 -> 64-bit largesize
    follows; size == 0 -> box extends to end of file; unknown boxes
    skipped; containers (moov/trak/mdia/minf/stbl) recursed;
  * ``ftyp``: major brand;
  * ``mvhd`` v0/v1: movie timescale + duration (32/64-bit layouts),
    floor-integer duration_ms;
  * per ``trak``: ``hdlr`` handler type (vide/soun/...), ``tkhd``
    v0/v1 width/height (16.16 fixed point -> integer part), ``mdhd``
    v0/v1 media timescale;
  * version > 1 of a versioned box raises NotImplementedError with
    the version; structural damage (truncated box, missing moov/
    mvhd, zero timescale) raises ValueError.

The Spark operator (operators/multimodal.probe_video) isolates both
families per-row, same contract as decode_images/decode_audio.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class Mp4Info(NamedTuple):
    major_brand: str
    timescale: int
    duration_ms: int
    n_tracks: int
    n_video: int
    n_audio: int
    width: int | None       # first video track, integer part
    height: int | None


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"truncated box {btype!r}")
        yield btype, body, pos + size
        pos += size


def _versioned(data: bytes, body: int, name: str) -> tuple[int, int]:
    version = data[body]
    if version > 1:
        raise NotImplementedError(f"{name} version={version}")
    return version, body + 4  # skip version + flags


def probe(payload: bytes) -> Mp4Info:
    """Parse the container and return movie/track metadata."""
    if len(payload) < 8:
        raise ValueError("not an ISO-BMFF file")
    brand = ""
    timescale = duration = None
    n_tracks = n_video = n_audio = 0
    width = height = None

    def walk(start: int, end: int, ctx: dict) -> None:
        nonlocal brand, timescale, duration
        nonlocal n_tracks, n_video, n_audio, width, height
        for btype, body, bend in _boxes(payload, start, end):
            if btype == b"ftyp":
                brand = payload[body:body + 4].decode(
                    "ascii", "replace").strip()
            elif btype == b"mvhd":
                v, p = _versioned(payload, body, "mvhd")
                if v == 1:
                    _c, _m, ts, dur = struct.unpack_from(
                        ">QQIQ", payload, p)
                else:
                    _c, _m, ts, dur = struct.unpack_from(
                        ">IIII", payload, p)
                timescale, duration = ts, dur
            elif btype == b"trak":
                n_tracks += 1
                tctx = {"handler": None, "w": None, "h": None}
                walk(body, bend, tctx)
                if tctx["handler"] == b"vide":
                    n_video += 1
                    if width is None:
                        width, height = tctx["w"], tctx["h"]
                elif tctx["handler"] == b"soun":
                    n_audio += 1
            elif btype == b"tkhd":
                v, p = _versioned(payload, body, "tkhd")
                # v1 widens creation/modification/duration to 64-bit
                p += (8 + 8 + 4 + 4 + 8) if v == 1 else (4 + 4 + 4 + 4 + 4)
                p += 8 + 2 + 2 + 2 + 2 + 36  # reserved/layer/volume/matrix
                w16, h16 = struct.unpack_from(">II", payload, p)
                ctx["w"], ctx["h"] = w16 >> 16, h16 >> 16
            elif btype == b"hdlr":
                _v, p = _versioned(payload, body, "hdlr")
                ctx["handler"] = payload[p + 4:p + 8]
            elif btype in _CONTAINERS:
                walk(body, bend, ctx)

    walk(0, len(payload), {})
    if timescale is None:
        raise ValueError("missing moov/mvhd")
    if timescale == 0:
        raise ValueError("zero timescale")
    return Mp4Info(brand, timescale, duration * 1000 // timescale,
                   n_tracks, n_video, n_audio, width, height)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_minimal_mp4(brand: str, timescale: int, duration: int,
                       tracks: list[tuple]) -> bytes:
    """Fixture encoder: ftyp + moov(mvhd + one trak per entry).
    Track entries: ('vide', w, h) or ('soun', 0, 0). No mdat — a
    metadata-only container, valid for the probe surface."""
    ftyp = _box(b"ftyp", brand.encode("ascii").ljust(4)
                + struct.pack(">I", 0) + brand.encode("ascii").ljust(4))
    traks = b""
    for i, (kind, w, h) in enumerate(tracks):
        tkhd = _box(b"tkhd", struct.pack(
            ">BBBB", 0, 0, 0, 7)
            + struct.pack(">IIII", 0, 0, i + 1, 0)
            + struct.pack(">I", duration)
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16))
        hdlr = _box(b"hdlr", struct.pack(">BBBB", 0, 0, 0, 0)
                    + struct.pack(">I", 0) + kind.encode("ascii")
                    + b"\x00" * 12 + b"name\x00")
        mdhd = _box(b"mdhd", struct.pack(">BBBB", 0, 0, 0, 0)
                    + struct.pack(">IIII", 0, 0, timescale, duration)
                    + struct.pack(">HH", 0x55C4, 0))
        mdia = _box(b"mdia", mdhd + hdlr)
        traks += _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", struct.pack(">BBBB", 0, 0, 0, 0)
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                + b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24
                + struct.pack(">I", len(tracks) + 1))
    return ftyp + _box(b"moov", mvhd + traks)
