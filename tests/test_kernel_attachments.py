"""Hand-computed goldens for attachment naming (E11/E12)."""

from stirling_pdf_spark.kernel.attachments import fallback_name, unique_names
from stirling_pdf_spark.kernel.extract import extract_doc


def test_fallback_chain():
    assert fallback_name("a.pdf", "media-deadbeef") == "a.pdf"
    assert fallback_name("", "media-deadbeef") == "attachment-deadbeef"


def test_unique_suffixing():
    # reference: AttachmentService.java:454-472 — base_1.ext, base_2.ext
    names = ["report.pdf", "report.pdf", "data.csv", "report.pdf", "notes"]
    assert unique_names(names) == [
        "report.pdf", "report_1.pdf", "data.csv", "report_2.pdf", "notes",
    ]


def test_suffix_collision_with_existing_name():
    assert unique_names(["a.txt", "a_1.txt", "a.txt"]) == [
        "a.txt", "a_1.txt", "a_2.txt",
    ]


def test_attachments_emitted_last_in_offset_order():
    raw = [
        ("attachment", "z.bin", "media-0000aaaa", 0),
        ("text", "1|72.0|72.0|11.0|F\thello world line", "", 1),
        ("attachment", "", "media-0000bbbb", 2),
    ]
    out = extract_doc(raw)
    assert [s.kind for s in out] == ["text", "attachment", "attachment"]
    assert out[1].text == "z.bin"
    assert out[2].text == "attachment-0000bbbb"
    assert [s.order for s in out] == [0, 1, 2]


def test_attachment_crud_operators(spark):
    """AttachmentService CRUD semantics over the docs table: add
    appends at the end, rename moves the match to the end, delete drops
    only the FIRST resolved-name match, and unmatched docs pass
    through (bulk semantics)."""
    from stirling_pdf_spark.operators.attachments import (
        add_attachments,
        delete_attachment,
        rename_attachment,
    )

    spans = [
        {"kind": "text", "text": "1|72.0|72.0|11.0|F\tbody line",
         "media_ref": "", "offset": 0},
        {"kind": "attachment", "text": "a.bin", "media_ref": "media-0000aaaa",
         "offset": 1},
        {"kind": "attachment", "text": "", "media_ref": "media-0000bbbb",
         "offset": 2},   # resolves to attachment-0000bbbb
        {"kind": "attachment", "text": "a.bin", "media_ref": "media-0000cccc",
         "offset": 3},   # duplicate raw name
    ]
    docs = spark.createDataFrame(
        [("d", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")

    def atts(df):
        row = df.collect()[0]["spans"]
        assert [s["offset"] for s in row] == list(range(len(row)))
        return [(s["text"], s["media_ref"]) for s in row
                if s["kind"] == "attachment"]

    # delete by FALLBACK name hits the empty-named span
    assert atts(delete_attachment(docs, "attachment-0000bbbb")) == [
        ("a.bin", "media-0000aaaa"), ("a.bin", "media-0000cccc")]
    # delete drops only the FIRST of two a.bin spans
    assert atts(delete_attachment(docs, "a.bin")) == [
        ("", "media-0000bbbb"), ("a.bin", "media-0000cccc")]
    # rename moves the (first) match to the END
    assert atts(rename_attachment(docs, "a.bin", "z.bin")) == [
        ("", "media-0000bbbb"), ("a.bin", "media-0000cccc"),
        ("z.bin", "media-0000aaaa")]
    # no match -> passthrough, offsets still dense
    assert atts(delete_attachment(docs, "nope")) == [
        ("a.bin", "media-0000aaaa"), ("", "media-0000bbbb"),
        ("a.bin", "media-0000cccc")]
    # add appends in order
    assert atts(add_attachments(docs, [("n1.txt", "media-11"),
                                       ("n2.txt", "media-22")]))[-2:] == [
        ("n1.txt", "media-11"), ("n2.txt", "media-22")]
