"""RIFF/WAVE PCM codec (kernel/wav.py): round trip, chunk-walk
conformance (unknown chunks, odd-size padding, stray trailing byte),
8-bit path, and honest NotImplementedError/ValueError scope limits."""

from __future__ import annotations

import struct

import pytest

from stirling_pdf_spark.kernel import wav


def test_roundtrip_mono():
    samples = [0, 100, -100, 32767, -32768, 7]
    info = wav.decode(wav.encode_pcm16(1, 8000, samples))
    assert info == wav.WavInfo(1, 8000, 16, 6, 0,
                               32768, sum(abs(s) for s in samples))


def test_roundtrip_stereo_duration_floor():
    # 3 frames at 999 Hz -> floor(3000/999) = 3 ms
    info = wav.decode(wav.encode_pcm16(2, 999, [1, -2, 3, -4, 5, -6]))
    assert (info.channels, info.n_frames, info.duration_ms) == (2, 3, 3)
    assert info.peak == 6 and info.sum_abs == 21


def test_unknown_chunk_skipped_and_odd_padding():
    body = wav.encode_pcm16(1, 8000, [5, -5])
    # splice an odd-sized LIST chunk (3 bytes + 1 pad) before fmt
    spliced = (body[:12]
               + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
               + body[12:])
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    info = wav.decode(spliced)
    assert info.n_frames == 2 and info.peak == 5


def test_stray_trailing_byte_ignored():
    payload = wav.encode_pcm16(1, 8000, [9, -9])
    # grow the data chunk size by one and append a slack byte
    bad = bytearray(payload)
    (size,) = struct.unpack_from("<I", bad, 40)
    struct.pack_into("<I", bad, 40, size + 1)
    bad += b"\x00"
    info = wav.decode(bytes(bad))
    assert info.n_frames == 2 and info.sum_abs == 18


def test_8bit_unsigned_path():
    data = bytes([128, 129, 127, 255, 0])
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8,
                      b"data", len(data))
    info = wav.decode(hdr + data)
    assert info.bits == 8 and info.n_frames == 5
    assert info.peak == 128 and info.sum_abs == 0 + 1 + 1 + 127 + 128


def test_non_pcm_and_wide_samples_raise_notimplemented():
    payload = bytearray(wav.encode_pcm16(1, 8000, [1, 2]))
    struct.pack_into("<H", payload, 20, 3)  # IEEE float tag
    with pytest.raises(NotImplementedError, match="wFormatTag=3"):
        wav.decode(bytes(payload))
    payload = bytearray(wav.encode_pcm16(1, 8000, [1, 2]))
    struct.pack_into("<H", payload, 34, 24)
    with pytest.raises(NotImplementedError, match="bits_per_sample=24"):
        wav.decode(bytes(payload))


def test_malformed_containers_raise_valueerror():
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError, match="WAVE"):
        wav.decode(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # fmt present, data missing
    hdr = struct.pack("<4sI4s4sIHHIIHH", b"RIFF", 28, b"WAVE",
                      b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="missing data"):
        wav.decode(hdr)
