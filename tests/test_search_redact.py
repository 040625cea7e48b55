"""E13 positional search and S12 redaction over handcrafted elements."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stirling_pdf_spark.operators.elements import ELEMENTS_SCHEMA
from stirling_pdf_spark.operators.extract_pipeline import SPANS_OUT_SCHEMA
from stirling_pdf_spark.operators.search import (
    match_offsets,
    redact_spans,
    text_search_elements,
)


@pytest.fixture(scope="module")
def elements(spark):
    # width model: char width = width / len(text); here 10 pt/char
    rows = [
        ("d1", 1, "text", "data and data again", None, "F", 11.0,
         100.0, 50.0, 190.0, 1_000_000, 0),
        ("d1", 2, "text", "no match here", None, "F", 11.0,
         100.0, 50.0, 130.0, 1_000_000, 0),
        ("d2", 1, "text", "database", None, "F", 11.0,
         0.0, 0.0, 80.0, 1_000_000, 0),
    ]
    return spark.createDataFrame(rows, ELEMENTS_SCHEMA)


def test_search_first_match_bbox(elements):
    out = {r["doc_id"]: r for r in
           text_search_elements(elements, "data").collect()}
    r = out["d1"]
    assert r["n_matches"] == 2
    assert r["x1"] == 100.0 and r["x2"] == 140.0   # chars 0..4 at 10pt
    assert r["y1"] == 50.0 and r["y2"] == 61.0
    assert out["d2"]["n_matches"] == 1             # substring of 'database'


def test_search_whole_word(elements):
    out = {r["doc_id"]: r for r in
           text_search_elements(elements, "data", whole_word=True).collect()}
    assert out["d1"]["n_matches"] == 2
    assert "d2" not in out                          # \bdata\b skips 'database'


def test_match_offsets_all_occurrences(elements):
    rows = match_offsets(elements, "data").filter(
        F.col("doc_id") == "d1").orderBy("match_no").collect()
    assert [(r["off"], r["match_len"]) for r in rows] == [(0, 4), (9, 4)]
    assert rows[1]["x1"] == 100.0 + 9 * 10.0


def test_redact_spans_masks_text_only(spark):
    rows = [("d1", [
        {"kind": "text", "text": "keep data safe", "media_ref": "", "order": 0},
        {"kind": "media", "text": "data", "media_ref": "m-1", "order": 1},
        {"kind": "attachment", "text": "data.bin", "media_ref": "m-2", "order": 2},
    ])]
    df = spark.createDataFrame(rows, SPANS_OUT_SCHEMA)
    out = redact_spans(df, "data").collect()[0]["spans"]
    assert out[0]["text"] == "keep ████ safe"
    assert out[1]["text"] == "data"          # media wire untouched
    assert out[2]["text"] == "data.bin"      # attachment name untouched
    assert [s["order"] for s in out] == [0, 1, 2]
