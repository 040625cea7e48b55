"""Baseline JPEG codec tests (kernel/jpeg.py).

The decoder is pinned three independent ways:
  * bit-exact encode->decode round trips for the flat-block fixture
    class the corpus uses (the closed-form case the driver oracle
    checks at scale);
  * an INDEPENDENT direct-summation IDCT (the textbook double loop,
    not the codec's matrix-product path) recomputing pixels from the
    decoder's own parsed coefficients would be circular — instead the
    general-content check bounds decode(encode(x)) error at quant=1,
    where T.81 guarantees near-lossless reconstruction;
  * structural edges: restart markers, byte stuffing, odd dimensions,
    truncation, progressive rejection.
"""

from __future__ import annotations

import numpy as np
import pytest

from stirling_pdf_spark.kernel import jpeg


def _flat_image(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 128, size=(h // 8, w // 8)) * 2  # even levels
    return np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)


def _idct_direct(coef: np.ndarray) -> np.ndarray:
    """Independent reference IDCT: the T.81 A.3.3 double summation,
    term by term (no matrix factorization shared with the codec)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = s / 4.0
    return out


def test_idct_matches_direct_summation():
    rng = np.random.RandomState(3)
    coef = rng.randint(-200, 200, size=(8, 8)).astype(float)
    assert np.allclose(jpeg.idct_2d(coef), _idct_direct(coef), atol=1e-9)


def test_dct_idct_inverse_pair():
    rng = np.random.RandomState(4)
    block = rng.randint(-128, 128, size=(8, 8)).astype(float)
    assert np.allclose(jpeg.idct_2d(jpeg.dct_2d(block)), block, atol=1e-9)


def test_flat_block_gray_roundtrip_exact():
    px = _flat_image(32, 24, seed=7)
    data = jpeg.encode_gray(32, 24, px.tobytes())
    w, h, nc, out = jpeg.decode(data)
    assert (w, h, nc) == (32, 24, 1)
    assert out == px.tobytes()


def test_flat_block_color_roundtrip_exact():
    """Gray-valued RGB through the 3-component 4:4:4 path: Y=v and
    Cb=Cr=128 exactly, so the color pipeline reconstructs bit-for-bit
    while still exercising interleaved-MCU decode + color convert."""
    px = _flat_image(16, 16, seed=9)
    rgb = np.stack([px, px, px], axis=-1)
    data = jpeg.encode_rgb444(16, 16, rgb.tobytes())
    w, h, nc, out = jpeg.decode(data)
    assert (w, h, nc) == (16, 16, 3)
    assert out == rgb.tobytes()


def test_restart_intervals_reset_predictors():
    px = _flat_image(40, 24, seed=11)
    plain = jpeg.encode_gray(40, 24, px.tobytes())
    rst = jpeg.encode_gray(40, 24, px.tobytes(), restart_interval=2)
    assert rst != plain and (b"\xFF\xD0" in rst or b"\xFF\xD1" in rst)
    for data in (plain, rst):
        _, _, _, out = jpeg.decode(data)
        assert out == px.tobytes()


def test_general_content_near_lossless_at_unit_quant():
    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    data = jpeg.encode_gray(40, 24, px.tobytes(), quant=1)
    _, _, _, out = jpeg.decode(data)
    rec = np.frombuffer(out, np.uint8).reshape(24, 40).astype(int)
    assert np.abs(rec - px.astype(int)).max() <= 1


def test_color_general_content_bounded_error():
    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    data = jpeg.encode_rgb444(16, 16, px.tobytes(), quant=2)
    _, _, nc, out = jpeg.decode(data)
    rec = np.frombuffer(out, np.uint8).reshape(16, 16, 3).astype(int)
    assert nc == 3 and np.abs(rec - px.astype(int)).max() <= 8


def test_odd_dimensions_edge_replication():
    rng = np.random.RandomState(19)
    px = rng.randint(0, 256, size=(10, 13)).astype(np.uint8)
    data = jpeg.encode_gray(13, 10, px.tobytes(), quant=1)
    w, h, _, out = jpeg.decode(data)
    assert (w, h) == (13, 10)
    rec = np.frombuffer(out, np.uint8).reshape(10, 13).astype(int)
    assert np.abs(rec - px.astype(int)).max() <= 1


def test_truncated_stream_raises_value_error():
    px = _flat_image(16, 8, seed=23)
    data = jpeg.encode_gray(16, 8, px.tobytes())
    for cut in (1, 4, 40, len(data) // 2, len(data) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            jpeg.decode(data[:cut])


def test_progressive_sof_rejected_honestly():
    px = _flat_image(8, 8, seed=29)
    data = bytearray(jpeg.encode_gray(8, 8, px.tobytes()))
    i = data.index(b"\xFF\xC0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg.decode(bytes(data))


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker code — spec-conforming third-party JPEGs pad this way, so
    the marker walk must skip the run instead of misreading seglen."""
    px = _flat_image(16, 8, seed=37)
    data = jpeg.encode_gray(16, 8, px.tobytes())
    baseline = jpeg.decode(data)
    i = data.index(b"\xFF\xC0")  # pad before SOF0
    padded = data[:i] + b"\xFF\xFF\xFF" + data[i:]
    assert jpeg.decode(padded) == baseline
    i = padded.index(b"\xFF\xDA")  # and before SOS too
    padded2 = padded[:i] + b"\xFF" + padded[i:]
    assert jpeg.decode(padded2) == baseline


def test_fill_bytes_before_restart_marker_accepted():
    px = _flat_image(40, 24, seed=41)
    data = jpeg.encode_gray(40, 24, px.tobytes(), restart_interval=2)
    baseline = jpeg.decode(data)
    i = data.index(b"\xFF\xD0")  # first RST0 in the entropy stream
    padded = data[:i] + b"\xFF\xFF" + data[i:]
    assert jpeg.decode(padded) == baseline


def test_byte_stuffing_roundtrip():
    """Content tuned to produce 0xFF bytes in the entropy stream: the
    writer must stuff 0x00 and the reader must unstuff."""
    rng = np.random.RandomState(31)
    for seed in range(5):
        px = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        data = jpeg.encode_gray(16, 16, px.tobytes(), quant=1)
        if b"\xFF\x00" in data:
            _, _, _, out = jpeg.decode(data)
            rec = np.frombuffer(out, np.uint8).reshape(16, 16).astype(int)
            assert np.abs(rec - px.astype(int)).max() <= 1
            return
    pytest.skip("no stuffed byte produced in 5 seeds")


def test_corpus_fixture_closed_form():
    """The corpus generator's promise to the SQL oracle: decoded pixel
    head == block-0 level repeated 8x, dims from sha256(ref)."""
    from stirling_pdf_spark.corpus.media import (
        jpeg_block_value, jpeg_dims_for_ref, jpeg_payload_for_ref)

    for ref in ("media-00aabbcc", "media-deadbeef", "media-0f1e2d3c"):
        is_color, w, h, rst = jpeg_dims_for_ref(ref)
        payload = jpeg_payload_for_ref(ref)
        dw, dh, nc, out = jpeg.decode(payload)
        assert (dw, dh) == (w, h)
        assert nc == (3 if is_color else 1)
        v0 = jpeg_block_value(ref, 0)
        assert out[:8] == bytes([v0] * 8)


def test_malformed_tables_raise_value_error_not_keyerror():
    """Missing DHT/DQT or an SOS naming an unknown component must stay
    per-row ValueErrors (KeyError/StopIteration would kill the whole
    Arrow batch in the decode stage)."""
    import struct

    px = _flat_image(8, 8, seed=41)
    data = jpeg.encode_gray(8, 8, px.tobytes())

    def strip_segments(marker):
        out = bytearray(data[:2])
        i = 2
        while i + 4 <= len(data):
            m = data[i + 1]
            if m == 0xDA:
                out += data[i:]
                break
            (ln,) = struct.unpack_from(">H", data, i + 2)
            if m != marker:
                out += data[i:i + 2 + ln]
            i += 2 + ln
        return bytes(out)

    for marker in (0xC4, 0xDB):          # DHT, DQT
        with pytest.raises(ValueError):
            jpeg.decode(strip_segments(marker))
    # SOS referencing a component id the SOF never declared
    bad = bytearray(data)
    i = bad.index(b"\xFF\xDA")
    bad[i + 5] = 9                        # first scan component id
    with pytest.raises(ValueError):
        jpeg.decode(bytes(bad))


def test_paletted_png_decodes_via_plte():
    """Color-type-3 PNG: indices defilter like any 1-channel scanline
    and map through the PLTE chunk."""
    import struct
    import zlib

    from stirling_pdf_spark.operators.multimodal import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    w, h = 5, 3
    palette = b"".join(bytes(((i * 3) % 256, (i * 5) % 256, (i * 7) % 256))
                       for i in range(256))
    idx = bytes((r * w + c) % 256 for r in range(h) for c in range(w))
    raw = b"".join(b"\x01" + bytes(
        [(idx[r * w + c] - (idx[r * w + c - 1] if c else 0)) & 0xFF
         for c in range(w)]) for r in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", palette)
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    W, H, px = decode_png(png)
    assert (W, H) == (w, h)
    assert px == b"".join(palette[3 * i:3 * i + 3] for i in idx)
    # missing PLTE -> ValueError, stays per-row isolated
    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)
