"""PDF -> DOCX structural export (kernel/docx_export.py): OPC member
set, WordprocessingML emission per block kind (pStyle headings, bold
labels, ListParagraph bullets, tables with a bold header row, italic
image placeholders), escaping and space preservation."""

from __future__ import annotations

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.docx_export import (
    CONTENT_TYPES, RELS, STYLES_XML, docx_members)
from stirling_pdf_spark.kernel.model import TextRun


def _doc(runs, media=()):
    spans = [("text", wire.encode_text_run(r), "", i)
             for i, r in enumerate(runs)]
    for m in media:
        spans.append(("media", m, "media-x", len(spans)))
    return spans


def _run(page, y, text, size=11.0, font="Helvetica", x=72.0):
    return TextRun(page, x, y, size, font, text)


def _document_xml(runs, media=()):
    members = dict((m[1], m[2]) for m in docx_members(
        "doc-1", _doc(runs, media)))
    return members["word/document.xml"]


def test_member_set_and_constants():
    runs = [_run(1, 40.0 + 14 * i, f"line {i}") for i in range(8)]
    members = docx_members("doc-1", _doc(runs))
    assert [(m[0], m[1]) for m in members] == [
        (0, "[Content_Types].xml"), (1, "_rels/.rels"),
        (2, "word/styles.xml"), (3, "word/document.xml")]
    assert members[0][2] == CONTENT_TYPES
    assert members[1][2] == RELS
    assert members[2][2] == STYLES_XML
    assert 'w:styleId="Heading1"' in STYLES_XML
    assert 'w:styleId="ListParagraph"' in STYLES_XML


def test_heading_and_paragraph_emission():
    runs = [_run(1, 40.0, "big title", size=18.0)]
    runs += [_run(1, 80.0 + 14 * i, f"body line {i}") for i in range(8)]
    doc = _document_xml(runs)
    assert doc.startswith('<?xml version="1.0" encoding="UTF-8" '
                          'standalone="yes"?>\n<w:document')
    assert ('<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
            '<w:r><w:t xml:space="preserve">big title</w:t></w:r></w:p>'
            in doc)
    assert ('<w:t xml:space="preserve">body line 0 body line 1' in doc)
    assert doc.endswith('<w:sectPr/>\n</w:body>\n</w:document>')


def test_bold_bullets_and_escaping():
    runs = [_run(1, 40.0, "Key & Point", font="Helvetica-Bold"),
            _run(1, 72.0, "• first <item>"),
            _run(1, 86.0, "• second"),
            _run(1, 100.0, "after a < b")]
    runs += [_run(1, 120.0 + 14 * i, f"pad {i}") for i in range(6)]
    doc = _document_xml(runs)
    assert ('<w:r><w:rPr><w:b/></w:rPr>'
            '<w:t xml:space="preserve">Key &amp; Point</w:t></w:r>'
            in doc)
    assert ('<w:pStyle w:val="ListParagraph"/></w:pPr>'
            '<w:r><w:t xml:space="preserve">first &lt;item&gt;</w:t>'
            in doc)
    assert doc.count('ListParagraph') == 2
    assert 'after a &lt; b' in doc


def test_image_placeholder_italic():
    runs = [_run(1, 72.0, "text")]
    doc = _document_xml(runs, media=["1|10.0|20.0|200.0|120.0"])
    assert ('<w:r><w:rPr><w:i/></w:rPr>'
            '<w:t xml:space="preserve">image redacted: 200x120pt</w:t>'
            in doc)


def test_table_bold_header_and_single_row_degrade():
    from stirling_pdf_spark.kernel.docx_export import _table
    t = _table([["Name", "Qty"], ["ab", "2"]])
    assert t.startswith("<w:tbl><w:tr><w:tc>")
    assert ('<w:tc><w:p><w:r><w:rPr><w:b/></w:rPr>'
            '<w:t xml:space="preserve">Name</w:t></w:r></w:p></w:tc>'
            in t)
    assert ('<w:tc><w:p><w:r><w:t xml:space="preserve">ab</w:t>'
            '</w:r></w:p></w:tc>' in t)
    assert _table([["only", "row"]]) == (
        '<w:p><w:r><w:t xml:space="preserve">only</w:t></w:r></w:p>\n'
        '<w:p><w:r><w:t xml:space="preserve">row</w:t></w:r></w:p>')


def test_empty_doc_emits_nothing():
    assert docx_members("doc-0", []) == []
