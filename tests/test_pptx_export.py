"""PDF -> PPTX structural export (kernel/pptx_export.py): one slide
per page, OPC member set with per-doc slide overrides, DrawingML
emission per block kind, and the per-page view (no cross-page
continuation absorb)."""

from __future__ import annotations

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.model import TextRun
from stirling_pdf_spark.kernel.pptx_export import pptx_members


def _doc(runs, media=()):
    spans = [("text", wire.encode_text_run(r), "", i)
             for i, r in enumerate(runs)]
    for m in media:
        spans.append(("media", m, "media-x", len(spans)))
    return spans


def _run(page, y, text, size=11.0, font="Helvetica", x=72.0):
    return TextRun(page, x, y, size, font, text)


def _two_page_doc():
    runs = [_run(1, 40.0, "Part 1", size=18.0)]
    runs += [_run(1, 80.0 + 14 * i, f"alpha line {i}") for i in range(8)]
    runs += [_run(2, 40.0, "Part 2", size=18.0)]
    runs += [_run(2, 80.0 + 14 * i, f"beta line {i}") for i in range(8)]
    return _doc(runs)


def test_one_slide_per_page_and_member_order():
    members = pptx_members("doc-1", _two_page_doc())
    assert [(m[0], m[1]) for m in members] == [
        (0, "[Content_Types].xml"), (1, "_rels/.rels"),
        (2, "ppt/presentation.xml"),
        (3, "ppt/_rels/presentation.xml.rels"),
        (4, "ppt/slides/slide1.xml"), (5, "ppt/slides/slide2.xml")]
    by_name = dict((m[1], m[2]) for m in members)
    assert by_name["[Content_Types].xml"].count("slide+xml") == 2
    assert '<p:sldId id="256" r:id="rId1"/>' in by_name[
        "ppt/presentation.xml"]
    assert '<p:sldId id="257" r:id="rId2"/>' in by_name[
        "ppt/presentation.xml"]
    assert 'Target="slides/slide2.xml"' in by_name[
        "ppt/_rels/presentation.xml.rels"]


def test_slide_content_and_no_cross_page_absorb():
    # page 2 opens with a lowercase continuation paragraph — the
    # stitched exporters would absorb it into page 1; slides must not
    runs = [_run(1, 40.0 + 14 * i, f"alpha line {i}") for i in range(8)]
    runs += [_run(2, 40.0 + 14 * i, f"beta line {i}") for i in range(8)]
    members = dict((m[1], m[2]) for m in pptx_members("d", _doc(runs)))
    s1, s2 = members["ppt/slides/slide1.xml"], members[
        "ppt/slides/slide2.xml"]
    assert "alpha line 7" in s1 and "beta" not in s1
    assert "beta line 0" in s2


def test_block_kind_emission():
    runs = [_run(1, 40.0, "Big Title", size=18.0),
            _run(1, 80.0, "Key Label", font="Helvetica-Bold"),
            _run(1, 110.0, "• item one"),
            _run(1, 124.0, "plain a < b")]
    runs += [_run(1, 150.0 + 14 * i, f"pad {i}") for i in range(6)]
    members = dict((m[1], m[2]) for m in pptx_members("d", _doc(runs)))
    s1 = members["ppt/slides/slide1.xml"]
    assert ('<a:r><a:rPr b="1" sz="3200"/><a:t>Big Title</a:t></a:r>'
            in s1)
    assert '<a:r><a:rPr b="1"/><a:t>Key Label</a:t></a:r>' in s1
    assert ('<a:pPr><a:buChar char="•"/></a:pPr>'
            '<a:r><a:rPr/><a:t>item one</a:t></a:r>' in s1)
    assert 'plain a &lt; b' in s1


def test_image_placeholder_and_empty_doc():
    runs = [_run(1, 72.0, "text")]
    members = dict((m[1], m[2]) for m in pptx_members(
        "d", _doc(runs, media=["1|10.0|20.0|200.0|120.0"])))
    assert ('<a:r><a:rPr i="1"/><a:t>image redacted: 200x120pt</a:t>'
            in members["ppt/slides/slide1.xml"])
    assert pptx_members("d", []) == []
