"""/edit-text: joined-page find/replace kernel + operator."""

from __future__ import annotations

import pytest

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.edittext import (
    apply_edits_to_page,
    compile_edits,
)
from stirling_pdf_spark.kernel.model import TextRun


def _apply(texts, edits, whole_word=False):
    return apply_edits_to_page(texts, compile_edits(edits, whole_word))


def test_same_element_replace_and_order():
    texts, n = _apply(["the old name here"], [("old", "new"),
                                              ("new name", "brand")])
    # ordered: the second edit sees the first's output
    assert texts == ["the brand here"]
    assert n == 1


def test_cross_element_match_anchors_at_first():
    texts, n = _apply(["hello al", "pha world"], [("alpha", "X")])
    assert texts == ["hello X", " world"]
    assert n == 2


def test_cross_element_intermediates_emptied():
    texts, n = _apply(["aa B", "BB", "B cc"], [("BBBB", "-")])
    assert texts == ["aa -", "", " cc"]
    assert n == 3


def test_whole_word_lookaround_fires_for_nonword_find():
    # \b would never fire for a find starting with '-' preceded by a
    # space; the reference uses lookarounds for exactly this case
    texts, _ = _apply(["x -foo y"], [("-foo", "Z")], whole_word=True)
    assert texts == ["x Z y"]
    texts, _ = _apply(["prefoo bar"], [("foo", "Z")], whole_word=True)
    assert texts == ["prefoo bar"]     # inside a word: no match


def test_right_to_left_keeps_positions_valid():
    texts, _ = _apply(["aaaa"], [("aa", "aaa")])
    assert texts == ["aaaaaa"]         # two non-overlapping matches


def test_empty_edit_list_and_empty_find_rejected():
    with pytest.raises(ValueError):
        compile_edits([])
    with pytest.raises(ValueError):
        compile_edits([("", "x")])


def test_operator_page_filter_positional(spark):
    from stirling_pdf_spark.operators.edittext import edit_text

    runs = [TextRun(1, 72.0, 72.0, 11.0, "F", "target one"),
            TextRun(3, 72.0, 72.0, 11.0, "F", "target three")]
    spans = [dict(kind="text", text=wire.encode_text_run(r),
                  media_ref="", offset=i) for i, r in enumerate(runs)]
    spans.append(dict(kind="meta", text="title|T", media_ref="",
                      offset=2))
    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    docs = spark.createDataFrame([("doc-a", spans)], schema)
    # page 3 is POSITIONAL page 2 (the doc has pages 1 and 3)
    [row] = edit_text(docs, [("target", "hit")],
                      page_numbers="2").collect()
    contents = [s["text"].split("\t")[-1] for s in row["spans"]
                if s["kind"] == "text"]
    assert contents == ["target one", "hit three"]
    assert row["spans"][2]["text"] == "title|T"  # meta untouched


def test_operator_all_pages_default(spark):
    from stirling_pdf_spark.operators.edittext import edit_text

    runs = [TextRun(p, 72.0, 72.0, 11.0, "F", f"v{p} data")
            for p in (1, 2)]
    spans = [dict(kind="text", text=wire.encode_text_run(r),
                  media_ref="", offset=i) for i, r in enumerate(runs)]
    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    docs = spark.createDataFrame([("doc-a", spans)], schema)
    [row] = edit_text(docs, [("data", "info")]).collect()
    contents = [s["text"].split("\t")[-1] for s in row["spans"]]
    assert contents == ["v1 info", "v2 info"]
