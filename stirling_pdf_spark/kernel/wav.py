"""RIFF/WAVE PCM codec (decode + fixture encoder).

Audio lands in a 100-TB multimodal corpus as opaque ``binary``
payload columns; the decode/feature stage must run per-row inside a
narrow Arrow batch with per-file error isolation (exactly like the
image codecs in kernel/jpeg.py / kernel/gif.py). WAV/PCM is the one
audio container fully decodable from the public spec with the
standard library, so — mirroring the reference's image-first media
handling (it ships no audio pipeline; ExtractImagesController is the
closest analogue) — this module implements the real thing:

  * RIFF walk per the Microsoft/IBM WAVE spec (RIFF form ``WAVE``,
    chunks padded to even offsets, unknown chunks skipped);
  * ``fmt ``: PCM only (wFormatTag == 1); 8-bit unsigned and 16-bit
    signed little-endian samples. Anything else (IEEE float, ADPCM,
    extensible, 24-bit) raises NotImplementedError with the tag so
    the decode stage records an honest per-row reason;
  * ``data``: integer sample statistics — frame count, floor-integer
    duration in ms, peak = max |sample|, sum_abs = sum |sample| over
    ALL interleaved channels. Integer outputs keep the DuckDB oracle
    exact (the repo-wide no-float-flags discipline).

Truncated/malformed containers raise ValueError; the Spark operator
(operators/multimodal.decode_audio) converts both error families into
null rows + reason, never a batch failure.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class WavInfo(NamedTuple):
    channels: int
    sample_rate: int
    bits: int
    n_frames: int
    duration_ms: int
    peak: int
    sum_abs: int


def decode_samples(payload: bytes):
    """Parse a RIFF/WAVE container and return the raw interleaved
    integer samples: (channels, sample_rate, bits, ndarray[int64]).
    8-bit streams are re-centered to signed (-128..127). The feature
    stages (decode -> aggregate stats, audio_silence_stats -> trim
    offsets) share this one parser so container handling never
    diverges between them."""
    if len(payload) < 12 or payload[0:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF form is not WAVE")
    fmt = None
    data = None
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise ValueError("fmt chunk truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data" and data is None:
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM wFormatTag={tag}")
    if bits not in (8, 16):
        raise NotImplementedError(f"unsupported bits_per_sample={bits}")
    if channels < 1 or rate < 1:
        raise ValueError("invalid channel count or sample rate")

    import numpy as np

    if bits == 16:
        # a stray trailing byte is spec-pad slack, not a sample
        arr = np.frombuffer(data[:len(data) // 2 * 2],
                            dtype="<i2").astype(np.int64)
    else:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    return channels, rate, bits, arr


def decode(payload: bytes) -> WavInfo:
    """Parse a RIFF/WAVE container and compute integer sample stats."""
    channels, rate, bits, arr = decode_samples(payload)
    a = abs(arr)
    peak = int(a.max()) if a.size else 0
    sum_abs = int(a.sum())
    n_frames = arr.size // channels
    return WavInfo(channels, rate, bits, n_frames,
                   n_frames * 1000 // rate, peak, sum_abs)


def encode_pcm16(channels: int, sample_rate: int,
                 samples: list[int]) -> bytes:
    """Interleaved 16-bit signed samples -> canonical 44-byte-header
    WAV (the fixture encoder; also a valid general-purpose writer)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
        b"data", len(data))
    return hdr + data
