"""ISO-BMFF probe (kernel/mp4.py): box-walk conformance (largesize,
size-0 to-EOF, unknown boxes), v0/v1 versioned layouts, track
classification, fixed-point dimensions, and honest error scope."""

from __future__ import annotations

import struct

import pytest

from stirling_pdf_spark.kernel import mp4


def test_roundtrip_video_audio():
    b = mp4.encode_minimal_mp4("isom", 600, 7203, [("vide", 640, 360),
                                                   ("soun", 0, 0)])
    info = mp4.probe(b)
    assert info == mp4.Mp4Info("isom", 600, 7203 * 1000 // 600,
                               2, 1, 1, 640, 360)


def test_audio_only_has_null_dims():
    info = mp4.probe(mp4.encode_minimal_mp4(
        "mp42", 48000, 48000 * 3 + 1, [("soun", 0, 0)]))
    assert (info.n_tracks, info.n_video, info.n_audio) == (1, 0, 1)
    assert info.width is None and info.height is None
    assert info.duration_ms == (48000 * 3 + 1) * 1000 // 48000


def test_unknown_boxes_skipped_and_free_box():
    b = mp4.encode_minimal_mp4("isom", 1000, 2500, [("vide", 64, 48)])
    # splice an unknown box between ftyp and moov
    ftyp_len = struct.unpack_from(">I", b, 0)[0]
    spliced = (b[:ftyp_len]
               + struct.pack(">I", 16) + b"skip" + b"\x00" * 8
               + b[ftyp_len:])
    assert mp4.probe(spliced).duration_ms == 2500


def test_largesize_box():
    b = mp4.encode_minimal_mp4("isom", 600, 600, [("vide", 32, 32)])
    ftyp_len = struct.unpack_from(">I", b, 0)[0]
    moov = b[ftyp_len:]
    # rewrite moov with size==1 + 64-bit largesize
    large = (struct.pack(">I", 1) + b"moov"
             + struct.pack(">Q", len(moov) + 8) + moov[8:])
    assert mp4.probe(b[:ftyp_len] + large).timescale == 600


def test_mvhd_v1_64bit_layout():
    body = (struct.pack(">BBBB", 1, 0, 0, 0)
            + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 9 + 1))
    moov = mp4._box(b"moov", mp4._box(b"mvhd", body))
    info = mp4.probe(mp4._box(b"ftyp", b"isom" + b"\x00" * 8) + moov)
    assert info.timescale == 90000
    assert info.duration_ms == (90000 * 9 + 1) * 1000 // 90000


def test_error_scope():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        mp4.probe(b"tiny")
    with pytest.raises(ValueError, match="missing moov"):
        mp4.probe(struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated"):
        mp4.probe(struct.pack(">I", 4096) + b"moov" + b"\x00" * 8)
    b = bytearray(mp4.encode_minimal_mp4("isom", 600, 600,
                                         [("vide", 32, 32)]))
    b[b.find(b"tkhd") + 4] = 3
    with pytest.raises(NotImplementedError, match="tkhd version=3"):
        mp4.probe(bytes(b))
