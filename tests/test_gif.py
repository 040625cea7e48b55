"""GIF codec tests (kernel/gif.py — LZW, palette mapping)."""

from __future__ import annotations

import random

import pytest

from stirling_pdf_spark.kernel import gif


def _gray_rgb(indices: bytes) -> bytes:
    return b"".join(bytes((i, i, i)) for i in indices)


def test_roundtrip_random_content():
    rng = random.Random(7)
    for _ in range(15):
        w, h = rng.randint(1, 48), rng.randint(1, 48)
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        out_w, out_h, rgb = gif.decode(gif.encode_gif(w, h, idx))
        assert (out_w, out_h) == (w, h)
        assert rgb == _gray_rgb(idx)


def test_roundtrip_repetitive_content_hits_width_growth_and_cap():
    # long repeats push the LZW table through every code width up to
    # the 12-bit cap and force a mid-stream CLEAR
    idx = bytes((i % 3) for i in range(200 * 200))
    w, h, rgb = gif.decode(gif.encode_gif(200, 200, idx))
    assert (w, h) == (200, 200) and rgb == _gray_rgb(idx)


def test_custom_palette_maps_colors():
    palette = [(255 - i, i, (i * 7) % 256) for i in range(256)]
    idx = bytes([0, 1, 255, 17])
    _, _, rgb = gif.decode(gif.encode_gif(4, 1, idx, palette))
    assert rgb == b"".join(bytes(palette[i]) for i in idx)


def test_gif89a_extension_blocks_are_skipped():
    data = bytearray(gif.encode_gif(2, 2, bytes([1, 2, 3, 4])))
    data[:6] = b"GIF89a"
    # splice a graphic control extension before the image descriptor
    # (fixed offset: 13-byte header+LSD plus the 768-byte GCT — the
    # palette itself contains 0x2C bytes, so searching would mis-hit)
    i = 13 + 768
    assert data[i] == 0x2C
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    data[i:i] = ext
    w, h, rgb = gif.decode(bytes(data))
    assert (w, h) == (2, 2) and rgb == _gray_rgb(bytes([1, 2, 3, 4]))


def test_interlaced_rejected_honestly():
    data = bytearray(gif.encode_gif(4, 4, bytes(range(16))))
    i = 13 + 768
    assert data[i] == 0x2C
    data[i + 9] |= 0x40                   # set the interlace flag
    with pytest.raises(NotImplementedError):
        gif.decode(bytes(data))


def test_truncation_raises_value_error():
    data = gif.encode_gif(16, 16, bytes(range(256)))
    # cuts that remove actual image data; losing only the trailing
    # terminator/trailer still decodes (tolerant, like real decoders)
    for cut in (3, 10, 40, len(data) // 2, len(data) - 40):
        with pytest.raises((ValueError, NotImplementedError)):
            gif.decode(data[:cut])
    w, h, _rgb = gif.decode(data[:-2])
    assert (w, h) == (16, 16)


def test_corpus_fixture_closed_form():
    from stirling_pdf_spark.corpus.media import (
        gif_dims_for_ref, gif_index_stream, gif_payload_for_ref)

    for ref in ("media-00aabbcc", "media-deadbeef", "media-0f1e2d3c"):
        w, h = gif_dims_for_ref(ref)
        dw, dh, rgb = gif.decode(gif_payload_for_ref(ref))
        assert (dw, dh) == (w, h)
        assert rgb == _gray_rgb(gif_index_stream(ref, w * h))
