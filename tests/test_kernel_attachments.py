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
