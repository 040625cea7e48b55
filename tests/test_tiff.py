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


def test_multipage_roundtrip_and_first_page_compat():
    from stirling_pdf_spark.kernel.tiff import decode_pages, encode_tiff_multi
    pages = []
    for i in range(4):
        w, h, ch = 3 + i, 2 + i, 1 if i % 2 == 0 else 3
        pages.append((w, h, _px(w, h, ch), ch))
    for bo in ("II", "MM"):
        for comp in (1, 32773):
            buf = encode_tiff_multi(pages, compression=comp,
                                    rows_per_strip=2, byte_order=bo)
            got = decode_pages(buf)
            assert [(w, h, ch, px) for (w, h, px, ch) in pages] == got
            # decode() keeps seeing page 0 only
            w0, h0, px0, ch0 = pages[0]
            assert decode(buf) == (w0, h0, ch0, px0)


def test_multipage_cycle_guard():
    import struct as _s
    from stirling_pdf_spark.kernel.tiff import decode_pages, encode_tiff_multi
    pages = [(3, 2, _px(3, 2, 1), 1), (4, 3, _px(4, 3, 1), 1)]
    buf = bytearray(encode_tiff_multi(pages))
    # point the LAST page's next pointer back at the first IFD,
    # forming a cycle: find the final 4 zero bytes (chain terminator)
    (first_ifd,) = _s.unpack("<I", buf[4:8])
    assert buf[-4:] == b"\x00\x00\x00\x00"
    buf[-4:] = _s.pack("<I", first_ifd)
    with pytest.raises(ValueError, match="cycle"):
        decode_pages(bytes(buf))


def test_tiff_pages_operator_error_isolation(spark):
    from stirling_pdf_spark.kernel.tiff import encode_tiff_multi
    from stirling_pdf_spark.operators.multimodal import tiff_pages
    good = encode_tiff_multi([(3, 2, _px(3, 2, 1), 1),
                              (5, 4, _px(5, 4, 3), 3)])
    rows = [("m-good", bytearray(good)), ("m-bad", bytearray(b"II*\x00junk"))]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {(r.media_ref, r.page): (r.width, r.height, r.px_head)
           for r in tiff_pages(df).collect()}
    assert got[("m-good", 0)] == (3, 2, _px(3, 2, 1)[:8].hex())
    assert got[("m-good", 1)][:2] == (5, 4)
    assert got[("m-bad", None)] == (None, None, None)


def test_images_to_pdf_expands_multipage_tiff(spark):
    from stirling_pdf_spark.kernel.tiff import encode_tiff, encode_tiff_multi
    from stirling_pdf_spark.operators.multimodal import images_to_pdf
    multi = encode_tiff_multi([(6, 4, _px(6, 4, 1), 1),
                               (8, 5, _px(8, 5, 1), 1),
                               (3, 7, _px(3, 7, 1), 1)])
    single = encode_tiff(9, 2, _px(9, 2, 1))
    rows = [("d1", 0, "m-multi", bytearray(multi)),
            ("d1", 1, "m-single", bytearray(single))]
    df = spark.createDataFrame(
        rows, "doc_id string, seq int, media_ref string, payload binary")
    out = images_to_pdf(df, fit_option="fitDocumentToImage").collect()
    assert len(out) == 1
    spans = out[0].spans
    media = [s for s in spans if s.kind == "media"]
    # 3 frames + 1 single-frame image = 4 pages, in (seq, frame) order
    assert [m.media_ref for m in media] == [
        "m-multi#p0", "m-multi#p1", "m-multi#p2", "m-single"]
    assert [m.text for m in media] == [
        "1|0.0|0.0|6.0|4.0", "2|0.0|0.0|8.0|5.0",
        "3|0.0|0.0|3.0|7.0", "4|0.0|0.0|9.0|2.0"]
    metas = [s.text for s in spans if s.kind == "pagemeta"]
    assert metas == ["1|6.0|4.0|0|", "2|8.0|5.0|0|",
                     "3|3.0|7.0|0|", "4|9.0|2.0|0|"]
