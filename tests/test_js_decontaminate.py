"""Show-javascript concatenation and benchmark decontamination."""

from __future__ import annotations

from stirling_pdf_spark.operators.dedup import decontaminate
from stirling_pdf_spark.operators.pageops import show_javascript

DOCS_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def _meta(txt, off):
    return dict(kind="meta", text=txt, media_ref="", offset=off)


def test_show_javascript_concatenates_in_name_order(spark):
    rows = [
        ("doc-a", [_meta("js_zeta|code Z", 0),
                   _meta("title|ignored", 1),
                   _meta("js_alpha|code A", 2)]),
        ("doc-b", [_meta("title|only", 0)]),
        ("doc-c", [_meta("js_empty|   ", 0)]),   # whitespace-only code
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r["doc_id"]: r["script"] for r in show_javascript(df).collect()}
    assert got["doc-a"] == ("// File: doc-a, Script: alpha\ncode A\n"
                            "// File: doc-a, Script: zeta\ncode Z\n")
    assert got["doc-b"] == "PDF 'doc-b' does not contain Javascript"
    # :44 trim check — whitespace-only scripts are skipped entirely
    assert got["doc-c"] == "PDF 'doc-c' does not contain Javascript"


def test_show_javascript_code_may_contain_pipes(spark):
    df = spark.createDataFrame(
        [("doc-a", [_meta("js_x|if (a||b) { run(); }", 0)])], DOCS_SCHEMA)
    [r] = show_javascript(df).collect()
    assert r["script"] == "// File: doc-a, Script: x\nif (a||b) { run(); }\n"


def _txt(words):
    return " ".join(words)


def test_decontaminate_flags_overlap(spark):
    bench_words = [f"b{i}" for i in range(20)]
    docs = spark.createDataFrame([
        ("clean", _txt([f"c{i}" for i in range(20)])),
        ("dirty", _txt(["x", "y"] + bench_words[:13] + ["z"])),
        ("short", _txt(["a"] * 5)),          # < 13 words -> no shingles
        ("exact", _txt(bench_words)),
    ], "doc_id string, text string")
    bench = spark.createDataFrame(
        [("bench-1", _txt(bench_words))], "doc_id string, text string")
    got = {r["id"]: (r["n_contaminated"], r["contaminated"],
                     r["n_shingles"])
           for r in decontaminate(docs, bench, n=13).collect()}
    assert got["clean"] == (0, False, 8)
    assert got["dirty"] == (1, True, 4)       # only the aligned window
    assert got["short"] == (0, False, 0)
    assert got["exact"] == (8, True, 8)


def test_decontaminate_counts_distinct_hits(spark):
    words = [f"w{i}" for i in range(30)]
    docs = spark.createDataFrame(
        [("d", _txt(words))], "doc_id string, text string")
    bench = spark.createDataFrame(
        [("b", _txt(words[:20]))], "doc_id string, text string")
    [r] = decontaminate(docs, bench, n=13).collect()
    # doc has 18 shingles; bench has 8; overlap = those fully inside
    # the first 20 words = 8
    assert (r["n_shingles"], r["n_contaminated"]) == (18, 8)
