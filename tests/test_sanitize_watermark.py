"""Watermark grid, blank-page removal, sanitize options.

Grid math is pinned against a direct transcription of the
WatermarkController formulas; sanitize against hand-built docs with
every span category present.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.model import TextRun
from stirling_pdf_spark.operators.pageops import (
    add_watermark,
    remove_blank_pages,
    sanitize_docs,
)

DOCS_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def java_grid(text_lines, rotation, ws, hs, fs, page_w=612.0, page_h=792.0):
    """WatermarkController.addTextWatermark grid, with the repo's
    width model (len * 0.5 * fs) in place of font.getStringWidth."""
    wm_w = ws + max(len(t) for t in text_lines) * 0.5 * fs
    wm_h = hs + fs * len(text_lines)
    rad = math.radians(rotation)
    nw = abs(wm_w * math.cos(rad)) + abs(wm_h * math.sin(rad))
    nh = abs(wm_w * math.sin(rad)) + abs(wm_h * math.cos(rad))
    rows = min(int(page_h / nh + 1), 10_000)
    cols = min(int(page_w / nw + 1), 10_000)
    out = []
    for i in range(rows + 1):
        for j in range(cols + 1):
            for k, t in enumerate(text_lines):
                out.append((j * nw, i * nh - k * fs, t))
    return out


def _one_page_doc(spark, content="body line"):
    run = TextRun(1, 72.0, 72.0, 11.0, "Helvetica", content)
    rows = [("doc-a", [dict(kind="text", text=wire.encode_text_run(run),
                            media_ref="", offset=0)])]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_watermark_grid_counts_and_positions(spark):
    docs = _one_page_doc(spark)
    out = add_watermark(docs, "WM", rotation=30.0, width_spacer=100,
                        height_spacer=80, font_size=24.0)
    [row] = out.collect()
    stamps = [s for s in row["spans"] if "\tWM" in s["text"]]
    want = java_grid(["WM"], 30.0, 100, 80, 24.0)
    assert len(stamps) == len(want)
    # positions: page_h - y_pdf, x as computed
    got = sorted((round(float(s["text"].split("|")[1]), 6),
                  round(float(s["text"].split("|")[2]), 6))
                 for s in stamps)
    wantpos = sorted((round(x, 6), round(792.0 - y, 6)) for x, y, _ in want)
    assert got == wantpos


def test_watermark_multiline_stacks_lines(spark):
    docs = _one_page_doc(spark)
    out = add_watermark(docs, "AA\\nBB", rotation=0.0, width_spacer=400,
                        height_spacer=600, font_size=20.0)
    [row] = out.collect()
    stamps = [s["text"] for s in row["spans"]
              if s["text"].endswith("\tAA") or s["text"].endswith("\tBB")]
    # grid: nh = 600+40=640 -> rows=int(792/640+1)=2 -> i 0..2;
    # nw = 400+20=420 -> cols=int(612/420+1)=2 -> j 0..2; 9 cells x 2 lines
    assert len(stamps) == 18
    # BB sits fs below AA in pdf space = fs HIGHER screen y
    ys = {ln: sorted({float(t.split("|")[2]) for t in stamps
                      if t.endswith("\t" + ln)}) for ln in ("AA", "BB")}
    assert all(abs(b - a - 20.0) < 1e-9
               for a, b in zip(ys["AA"], ys["BB"]))


def test_watermark_offsets_survive_int32_range(spark):
    """page * stamps_per_page past 2^31 must not wrap: the painted
    offsets are longs, so the grid still sorts AFTER the page's own
    content and in grid order."""
    run = TextRun(25_000_000, 72.0, 72.0, 11.0, "Helvetica", "body")
    rows = [("doc-a", [dict(kind="text", text=wire.encode_text_run(run),
                            media_ref="", offset=0)])]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = add_watermark(docs, "WM")  # default grid: 99 stamps/page
    [row] = out.collect()
    kinds = [s["text"].split("\t")[-1] for s in row["spans"]]
    assert kinds[0] == "body"              # original first, not wrapped
    assert set(kinds[1:]) == {"WM"}
    # offsets re-densified by _regroup, grid order preserved
    assert [s["offset"] for s in row["spans"]] == list(
        range(len(row["spans"])))
    xs = [float(s["text"].split("|")[1]) for s in row["spans"][1:]]
    ys = [float(s["text"].split("|")[2]) for s in row["spans"][1:]]
    want = java_grid(["WM"], 0.0, 50, 50, 30.0)
    assert xs == [round(x, 10) for x, _, _ in want]
    assert ys == [792.0 - y for _, y, _ in want]


def test_sanitize_short_link_body_keeps_slot_count(spark):
    """A Link annotation whose wire body has fewer than 4 pipe slots
    must keep its missing fields as EMPTY slots after remove_links —
    concat_ws drops nulls, which would shift split_part indices."""
    spans = [dict(kind="annotation",
                  text="1|10.0|10.0|20.0|20.0\tLink|https://x",
                  media_ref="", offset=0)]
    docs = spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)
    [row] = sanitize_docs(docs, remove_links=True).collect()
    assert row["spans"][0]["text"] == "1|10.0|10.0|20.0|20.0\tLink|||"


def test_remove_blank_pages_drops_and_renumbers(spark):
    spans = []
    for p, content in [(1, "one"), (2, "   "), (3, "three"), (4, "\t"),
                       (5, "five")]:
        run = TextRun(p, 72.0, 72.0, 11.0, "Helvetica", content)
        spans.append(dict(kind="text", text=wire.encode_text_run(run),
                          media_ref="", offset=len(spans)))
    spans.append(dict(kind="attachment", text="a.bin",
                      media_ref="media-1", offset=len(spans)))
    docs = spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)
    [row] = remove_blank_pages(docs).collect()
    texts = [s["text"] for s in row["spans"] if s["kind"] == "text"]
    pages = sorted(int(t.split("|")[0]) for t in texts)
    assert pages == [1, 2, 3]
    contents = {int(t.split("|")[0]): t.split("\t")[1] for t in texts}
    assert contents == {1: "one", 2: "three", 3: "five"}
    assert [s["kind"] for s in row["spans"]].count("attachment") == 1


def test_remove_blank_pages_keeps_media_only_pages(spark):
    spans = [
        dict(kind="text", text=wire.encode_text_run(
            TextRun(1, 72.0, 72.0, 11.0, "Helvetica", "  ")),
            media_ref="", offset=0),
        dict(kind="media", text="2|10.0|10.0|50.0|50.0",
             media_ref="media-x", offset=1),
    ]
    docs = spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)
    [row] = remove_blank_pages(docs).collect()
    # page 1 (whitespace text only) dropped; media page kept, renumbered 1
    assert [s["kind"] for s in row["spans"]] == ["media"]
    assert row["spans"][0]["text"].startswith("1|")


def _sanitize_fixture(spark):
    spans = [
        dict(kind="meta", text="title|Hello", media_ref="", offset=0),
        dict(kind="meta", text="is_encrypted|false", media_ref="",
             offset=1),
        dict(kind="meta", text="js_openaction|app.alert(1)",
             media_ref="", offset=2),
        dict(kind="text", text=wire.encode_text_run(
            TextRun(1, 72.0, 72.0, 11.0, "Helvetica", "hello world")),
            media_ref="", offset=3),
        dict(kind="annotation",
             text="1|10.0|10.0|20.0|20.0\tLink|https://x|me|sub",
             media_ref="", offset=4),
        dict(kind="annotation",
             text="1|30.0|30.0|20.0|20.0\tFileAttachment|f.bin|me|sub",
             media_ref="", offset=5),
        dict(kind="attachment", text="a.bin", media_ref="media-1",
             offset=6),
    ]
    return spark.createDataFrame([("doc-a", spans)], DOCS_SCHEMA)


def test_sanitize_all_options(spark):
    out = sanitize_docs(_sanitize_fixture(spark), remove_javascript=True,
                        remove_embedded_files=True, remove_metadata=True,
                        remove_links=True, remove_fonts=True)
    [row] = out.collect()
    by_kind = {}
    for s in row["spans"]:
        by_kind.setdefault(s["kind"], []).append(s["text"])
    assert "attachment" not in by_kind
    metas = by_kind.get("meta", [])
    assert metas == ["is_encrypted|false"]      # js_ + Info keys gone
    annots = by_kind.get("annotation", [])
    assert annots == ["1|10.0|10.0|20.0|20.0\tLink||me|sub"]
    [text] = by_kind["text"]
    assert text == "1|72.0|72.0|11.0|\thello world"   # font cleared
    # offsets dense
    assert [s["offset"] for s in row["spans"]] == list(
        range(len(row["spans"])))


def test_sanitize_defaults_keep_links_meta_fonts(spark):
    out = sanitize_docs(_sanitize_fixture(spark))
    [row] = out.collect()
    texts = [s["text"] for s in row["spans"]]
    assert "title|Hello" in texts
    assert "1|10.0|10.0|20.0|20.0\tLink|https://x|me|sub" in texts
    assert not any(t.startswith("js_") or "FileAttachment" in t
                   for t in texts)
    assert not any(s["kind"] == "attachment" for s in row["spans"])


def test_sanitize_noop_options(spark):
    out = sanitize_docs(_sanitize_fixture(spark), remove_javascript=False,
                        remove_embedded_files=False)
    before = _sanitize_fixture(spark).collect()[0]["spans"]
    after = out.collect()[0]["spans"]
    assert [tuple(s) for s in before] == [tuple(s) for s in after]
