"""Parity of every rearrange mode's closed-form page map against an
independent re-implementation of the reference's imperative loops
(RearrangePagesPDFController.java:93-207) — the Java builds a
newPageOrder list of 0-based source indices; the Spark operator
computes the same map as column math. One Spark job covers all page
counts 1..24 per mode."""

from __future__ import annotations

import pytest

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.model import TextRun

SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
          "media_ref:string,offset:int>>")


# --- reference loops, re-implemented 1:1 from the Java (0-based in,
# list of source indices out; slot i of the output shows source [i])

def _reverse(n):
    return list(range(n - 1, -1, -1))


def _duplex(n):
    out, half = [], (n + 1) // 2
    for i in range(1, half + 1):
        out.append(i - 1)
        if i <= n - half:
            out.append(n - i)
    return out


def _booklet(n):
    out = []
    for i in range(n // 2):
        out.append(i)
        out.append(n - i - 1)
    return out


def _side_stitch(n):
    out = []
    for i in range((n + 3) // 4):
        b = i * 4
        out += [min(b + 3, n - 1), min(b, n - 1),
                min(b + 1, n - 1), min(b + 2, n - 1)]
    return out


def _odd_even(n):
    return [i - 1 for i in range(1, n + 1, 2)] + \
           [i - 1 for i in range(2, n + 1, 2)]


def _remove_first(n):
    return [] if n <= 1 else list(range(1, n))


def _remove_last(n):
    return [] if n <= 1 else list(range(0, n - 1))


def _remove_first_last(n):
    return [] if n <= 2 else list(range(1, n - 1))


def _duplicate(n, c=2):
    return [p for p in range(n) for _ in range(c)]


_REF_LOOPS = {
    "REVERSE": _reverse,
    "DUPLEX_SORT": _duplex,
    "BOOKLET_SORT": _booklet,
    "SIDE_STITCH_BOOKLET_SORT": _side_stitch,
    "ODD_EVEN_SPLIT": _odd_even,
    "REMOVE_FIRST": _remove_first,
    "REMOVE_LAST": _remove_last,
    "REMOVE_FIRST_AND_LAST": _remove_first_last,
    "DUPLICATE": _duplicate,
}

MAX_N = 24


@pytest.fixture(scope="module")
def page_docs(spark):
    rows = []
    for n in range(1, MAX_N + 1):
        spans = [("text", wire.encode_text_run(
            TextRun(p, 72.0, 72.0, 11.0, "F", f"src{p - 1}")), "", p - 1)
            for p in range(1, n + 1)]
        rows.append((f"n{n:02d}", [dict(zip(
            ("kind", "text", "media_ref", "offset"), s)) for s in spans]))
    return spark.createDataFrame(rows, SCHEMA)


@pytest.mark.parametrize("mode", sorted(_REF_LOOPS))
def test_rearrange_mode_matches_reference_loop(spark, page_docs, mode):
    from stirling_pdf_spark.operators.pageops import rearrange_pages

    got = {}
    for r in rearrange_pages(page_docs, mode).collect():
        slots = sorted(
            (int(s["text"].split("|")[0]), s["text"].split("\t")[1])
            for s in r["spans"]
        )
        got[r["doc_id"]] = [t for _, t in slots]
    for n in range(1, MAX_N + 1):
        expect = [f"src{i}" for i in _REF_LOOPS[mode](n)]
        assert got.get(f"n{n:02d}", []) == expect, (mode, n)
    # output slots must be dense 1..len whenever any survive
    for r in rearrange_pages(page_docs, mode).collect():
        pages = sorted(int(s["text"].split("|")[0]) for s in r["spans"])
        assert pages == list(range(1, len(pages) + 1)), (mode, r["doc_id"])
