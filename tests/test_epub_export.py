"""PDF -> EPUB structural export (kernel/epub_export.py): OCF member
set, SMART_CHAPTER_EXPRESSION chapter splitting
(ConvertPDFToEpubController.java:26-27), front-matter chapter-0, and
the content.opf / nav.xhtml skeletons."""

from __future__ import annotations

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.epub_export import (
    CHAPTER_RE, MIMETYPE, epub_members)
from stirling_pdf_spark.kernel.model import TextRun


def _doc(runs):
    return [("text", wire.encode_text_run(r), "", i)
            for i, r in enumerate(runs)]


def _run(page, y, text, size=11.0, font="Helvetica", x=72.0):
    return TextRun(page, x, y, size, font, text)


def _chapter_doc():
    runs = [_run(1, 40.0, "Chapter 1", size=18.0)]
    runs += [_run(1, 80.0 + 14 * i, f"alpha line {i}") for i in range(8)]
    runs += [_run(1, 220.0, "Chapter 2", size=18.0)]
    runs += [_run(1, 250.0 + 14 * i, f"beta line {i}") for i in range(8)]
    return _doc(runs)


def test_smart_chapter_regex_is_search_case_insensitive():
    assert CHAPTER_RE.search("  chapter 4: The End")
    assert CHAPTER_RE.search("Appendix to Chapter 9")
    assert not CHAPTER_RE.search("Chapters are numbered")


def test_member_set_and_order():
    members = epub_members("doc-1", _chapter_doc())
    names = [m[1] for m in members]
    assert names == [
        "mimetype", "META-INF/container.xml", "OEBPS/content.opf",
        "OEBPS/nav.xhtml", "OEBPS/chapter-1.xhtml",
        "OEBPS/chapter-2.xhtml"]
    assert [m[0] for m in members] == list(range(6))
    assert members[0][2] == MIMETYPE


def test_chapter_bodies_and_titles():
    members = dict((m[1], m[2]) for m in epub_members(
        "doc-1", _chapter_doc()))
    c1 = members["OEBPS/chapter-1.xhtml"]
    c2 = members["OEBPS/chapter-2.xhtml"]
    assert "<title>Chapter 1</title>" in c1
    assert "<h1>Chapter 1</h1>" in c1
    assert "alpha line 0 alpha line 1" in c1
    assert "beta line" not in c1
    assert "<h1>Chapter 2</h1>" in c2
    assert "beta line 7" in c2


def test_front_matter_becomes_chapter_0():
    runs = [_run(1, 40.0 + 14 * i, f"preface line {i}")
            for i in range(8)]
    runs += [_run(1, 200.0, "Chapter 1", size=18.0)]
    runs += [_run(1, 230.0 + 14 * i, f"body line {i}") for i in range(8)]
    members = dict((m[1], m[2]) for m in epub_members("doc-7", _doc(runs)))
    assert "OEBPS/chapter-0.xhtml" in members
    # the untitled front-matter shows the doc id as its title
    assert "<title>doc-7</title>" in members["OEBPS/chapter-0.xhtml"]
    assert "preface line 0" in members["OEBPS/chapter-0.xhtml"]
    nav = members["OEBPS/nav.xhtml"]
    assert '<a href="chapter-0.xhtml">doc-7</a>' in nav
    assert '<a href="chapter-1.xhtml">Chapter 1</a>' in nav


def test_opf_manifest_spine_and_identifier():
    members = dict((m[1], m[2]) for m in epub_members(
        "doc-9", _chapter_doc()))
    opf = members["OEBPS/content.opf"]
    assert '<dc:identifier id="bookid">doc-9</dc:identifier>' in opf
    assert ('<item id="chapter-1" href="chapter-1.xhtml" '
            'media-type="application/xhtml+xml"/>') in opf
    assert '<itemref idref="chapter-1"/>' in opf
    assert '<itemref idref="chapter-2"/>' in opf
    assert opf.index('properties="nav"') < opf.index('id="chapter-1"')


def test_no_chapter_heading_single_spine_item():
    runs = [_run(1, 40.0 + 14 * i, f"plain line {i}") for i in range(10)]
    names = [m[1] for m in epub_members("doc-2", _doc(runs))]
    assert "OEBPS/chapter-0.xhtml" in names
    assert len([n for n in names if n.startswith("OEBPS/chapter-")]) == 1


def test_empty_doc_emits_nothing():
    assert epub_members("doc-0", []) == []
