"""Parity of overlay_docs_multi's closed-form page guides against
direct simulations of the reference's imperative loops
(PdfOverlayController.java:144-227) across many configurations of
overlay-file counts, per-file page counts, and base lengths."""

from __future__ import annotations

import pytest

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.model import TextRun

SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
          "media_ref:string,offset:int>>")


def _doc(doc_id, labels_by_page):
    spans = []
    for p, lab in labels_by_page:
        spans.append({"kind": "text", "text": wire.encode_text_run(
            TextRun(p, 72.0, 72.0 if lab.startswith("base") else 760.0,
                    11.0, "F", lab)), "media_ref": "", "offset": len(spans)})
    return (doc_id, spans)


# --- reference loops, simulated 1:1 (0-based overlay pages in, the
# guide maps base page -> (file_index, overlay_page 0-based))

def _seq_guide(n, pages):
    L = len(pages)
    guide, idx, pc = {}, 0, 0
    for bp in range(1, n + 1):
        if pc == 0 or pc >= pages[idx]:
            pc = 0
            idx = (idx + 1) % L
        guide[bp] = (idx, pc)
        pc += 1
    return guide


def _inter_guide(n, pages):
    return {bp: ((bp - 1) % len(pages), 0) for bp in range(1, n + 1)}


def _fixed_guide(n, pages, counts):
    guide, cur = {}, 1
    for i, (np_i, cnt) in enumerate(zip(pages, counts)):
        for _ in range(cnt):
            if cur > n:
                break
            for _pg in range(np_i):
                if cur > n:
                    break
                guide[cur] = (i, 0)  # PDFBox uses the file's FIRST page
                cur += 1
    return guide


CONFIGS = [
    (1, (2,)), (1, (1,)), (3, (1,)), (5, (2,)),
    (4, (2, 3)), (7, (2, 3)), (9, (1, 1, 1)), (8, (3, 1, 2)),
    (2, (3, 2, 1)), (6, (1, 2)),
]


@pytest.mark.parametrize("n,pages", CONFIGS)
def test_overlay_guides_match_reference_loops(spark, n, pages):
    from stirling_pdf_spark.operators.pageops import overlay_docs_multi

    base = spark.createDataFrame(
        [_doc("b", [(p, f"base{p}") for p in range(1, n + 1)])], SCHEMA)
    ovs = spark.createDataFrame(
        [_doc(f"ov-{i+1}", [(pg + 1, f"f{i}p{pg}") for pg in range(np_i)])
         for i, np_i in enumerate(pages)],
        SCHEMA)
    counts = [1 + (i % 2) for i in range(len(pages))]

    def got_guide(mode, **kw):
        out = overlay_docs_multi(base, ovs, mode, **kw).collect()
        got = {}
        for r in out:
            for s in r["spans"]:
                head, _, body = s["text"].partition("\t")
                if body.startswith("f"):
                    bp = int(head.split("|")[0])
                    assert bp not in got, ("dup overlay on page", bp)
                    got[bp] = body
        return got

    def fmt(guide):
        return {bp: f"f{fi}p{pg}" for bp, (fi, pg) in guide.items()}

    assert got_guide("SequentialOverlay") == fmt(_seq_guide(n, pages))
    assert got_guide("InterleavedOverlay") == fmt(_inter_guide(n, pages))
    assert got_guide("FixedRepeatOverlay", counts=counts) == \
        fmt(_fixed_guide(n, pages, counts))
