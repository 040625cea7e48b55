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


def _silence_ref(samples: list[int], channels: int, rate: int):
    """Pure-Python reference for the silence-trim feature."""
    n = len(samples)
    nz = [i for i, s in enumerate(samples) if s != 0]
    if nz:
        lead, trail = nz[0], n - 1 - nz[-1]
    else:
        lead, trail = n, 0
    kept = samples[lead:n - trail]
    return (n, lead, trail, (len(kept) // channels) * 1000 // rate,
            max((abs(s) for s in kept), default=0),
            sum(abs(s) for s in kept))


@pytest.mark.parametrize("samples,channels,rate", [
    ([0, 0, 0, 5, -7, 0, 3, 0, 0], 1, 1000),     # both-end runs
    ([0, 0, 0, 0], 2, 8000),                      # all silent
    ([1, -1], 1, 8000),                           # nothing to trim
    ([0, 9], 2, 8000),                            # lead only, stereo
])
def test_silence_stats_spark_matches_python(spark, samples, channels,
                                            rate):
    from stirling_pdf_spark.operators.multimodal import (
        audio_silence_stats,
    )

    payload = wav.encode_pcm16(channels, rate, samples)
    media = spark.createDataFrame(
        [("m1", payload)], "media_ref string, payload binary")
    row = audio_silence_stats(media).collect()[0]
    assert (row["n_samples"], row["lead_silence"], row["trail_silence"],
            row["trimmed_ms"], row["peak"], row["energy_abs"]) == \
        _silence_ref(samples, channels, rate)
    assert row["reason"] is None


def test_silence_stats_error_isolation(spark):
    from stirling_pdf_spark.operators.multimodal import (
        audio_silence_stats,
    )

    media = spark.createDataFrame(
        [("good", wav.encode_pcm16(1, 8000, [0, 4, 0])),
         ("bad", b"JUNKJUNKJUNKJUNK")],
        "media_ref string, payload binary")
    rows = {r["media_ref"]: r for r in audio_silence_stats(media).collect()}
    assert rows["good"]["lead_silence"] == 1
    assert rows["good"]["trail_silence"] == 1
    assert rows["bad"]["n_samples"] is None
    assert "RIFF" in rows["bad"]["reason"]


def test_silence_fixture_closed_form():
    from stirling_pdf_spark.corpus.media import (
        wav_dims_for_ref, wav_silence_pad_for_ref,
        wav_silence_payload_for_ref,
    )

    ref = "media-deadbeef"
    channels, rate, n_frames, amp = wav_dims_for_ref(ref)
    pad = wav_silence_pad_for_ref(ref)
    ch, r, bits, arr = wav.decode_samples(wav_silence_payload_for_ref(ref))
    n = n_frames * channels
    assert (ch, r, bits) == (channels, rate, 16)
    assert arr.size == pad + n
    assert not arr[:pad].any() and arr[pad] != 0 and arr[-1] != 0
    kept = arr[pad:]
    assert int(abs(kept).max()) == amp + 15
    assert int(abs(kept).sum()) == n * amp + (n // 16) * 120


def test_audio_energy_exact_and_isolated(spark):
    from stirling_pdf_spark.corpus.media import wav_payload_for_ref
    from stirling_pdf_spark.kernel import wav
    from stirling_pdf_spark.operators.multimodal import audio_energy

    payload = wav.encode_pcm16(1, 8000, [3, -4, 0, 5])
    media = spark.createDataFrame(
        [("ok", bytearray(payload)), ("bad", bytearray(b"not riff")),
         ("fixture", bytearray(wav_payload_for_ref("media-x")))],
        "media_ref string, payload binary")
    out = {r["media_ref"]: r for r in audio_energy(media).collect()}
    assert (out["ok"]["n_samples"], out["ok"]["peak"],
            out["ok"]["energy"]) == (4, 5, 9 + 16 + 0 + 25)
    assert out["bad"]["energy"] is None
    assert out["bad"]["reason"] is not None
    # fixture closed form: N*amp^2 + 15*N*amp + (N//16)*1240
    _c, _r, _b, arr = wav.decode_samples(
        wav_payload_for_ref("media-x"))
    assert out["fixture"]["energy"] == int((arr.astype("int64") ** 2).sum())
