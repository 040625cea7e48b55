"""Baseline TIFF 6.0 codec (kernel/tiff.py): encode->decode round
trips across byte orders, strip layouts and both lossless
compressions, PackBits spec cases, and scope-limit errors."""

import pytest

from stirling_pdf_spark.kernel.tiff import (
    decode, encode_tiff, packbits, unpackbits)


def _px(w: int, h: int, ch: int) -> bytes:
    return bytes((i * 37 + 11) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("byte_order", ["II", "MM"])
@pytest.mark.parametrize("compression", [1, 32773])
@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("rows_per_strip", [None, 1, 3])
@pytest.mark.parametrize("dims", [(1, 1), (5, 3), (16, 16), (7, 11)])
def test_roundtrip(byte_order, compression, channels, rows_per_strip,
                   dims):
    w, h = dims
    px = _px(w, h, channels)
    buf = encode_tiff(w, h, px, channels=channels,
                      compression=compression,
                      rows_per_strip=rows_per_strip,
                      byte_order=byte_order)
    assert buf[:2] == byte_order.encode()
    w2, h2, c2, px2 = decode(buf)
    assert (w2, h2, c2) == (w, h, channels)
    assert px2 == px


def test_packbits_spec_cases():
    # TIFF 6.0 §9 worked example
    data = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
                 + [0x80, 0x00] + [0x2A] * 2)
    enc = packbits(data)
    assert unpackbits(enc, len(data)) == data
    # replicate run of 128 (the cap)
    run = bytes([7] * 300)
    assert unpackbits(packbits(run), 300) == run
    # -128 control byte is a no-op
    assert unpackbits(bytes([0x80, 0x00, 0x41]), 1) == b"A"


def test_packbits_short_yield_raises():
    with pytest.raises(ValueError, match="packbits yielded"):
        unpackbits(bytes([0x00, 0x41]), 5)


def test_white_is_zero_inverts():
    # hand-build a PhotometricInterpretation=0 file by patching the
    # IFD of an encoded gray image (tag 262 SHORT value 1 -> 0)
    px = _px(4, 2, 1)
    buf = bytearray(encode_tiff(4, 2, px))
    idx = buf.find(bytes([262 & 0xFF, 262 >> 8]))  # II tag bytes
    assert idx > 0
    assert buf[idx + 8] == 1
    buf[idx + 8] = 0
    w, h, c, out = decode(bytes(buf))
    assert out == bytes(255 - b for b in px)


@pytest.mark.parametrize("mutate,err", [
    (lambda b: b"XX" + b[2:], "byte-order"),
    (lambda b: b[:12], "overruns"),
])
def test_malformed_raises(mutate, err):
    buf = encode_tiff(3, 3, _px(3, 3, 1))
    with pytest.raises(ValueError, match=err):
        decode(mutate(buf))


def test_scope_limits_raise_not_implemented():
    buf = bytearray(encode_tiff(3, 3, _px(3, 3, 1)))
    idx = buf.find(bytes([259 & 0xFF, 259 >> 8]))  # Compression tag
    buf[idx + 8] = 5  # LZW
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode(bytes(buf))
