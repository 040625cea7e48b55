"""Winnowing fingerprints (Schleimer et al. SIGMOD 2003): operator
vs a pure-Python reference, the detection guarantee (any shared run
of >= w+k-1 words yields a shared fingerprint), short-doc
conventions, and the match-pairs report."""

from __future__ import annotations

import hashlib

import pytest

from stirling_pdf_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_match_pairs,
)

K, W = 3, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _ref_fps(text: str, k: int = K, w: int = W) -> set[int]:
    toks = text.split()
    if len(toks) < k:
        return set()
    hs = [_h(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
    nwin = 1 if len(hs) < w else len(hs) - w + 1
    return {min(hs[j:j + w]) for j in range(nwin)}


DOCS = [
    (1, "a b c d e f g h i j"),
    (2, "x y a b c d e f q r"),      # shares the 6-word run a..f with 1
    (3, "one two"),                   # shorter than k -> no fps
    (4, "p q r s"),                   # fewer than w shingles -> 1 fp
    (5, "z z z z z z z z"),           # degenerate repeated token
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_fps_match_python_reference(docs_df):
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(docs_df).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _ref_fps(text), doc_id


def test_detection_guarantee_and_match_pairs(docs_df):
    # docs 1 and 2 share a run of 6 >= w + k - 1 = 6 words, so the
    # winnowing guarantee promises at least one shared fingerprint
    assert _ref_fps(DOCS[0][1]) & _ref_fps(DOCS[1][1])
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in winnow_match_pairs(docs_df, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] == len(_ref_fps(DOCS[0][1]) & _ref_fps(DOCS[1][1]))


def test_short_doc_conventions(docs_df):
    rows = winnow_fingerprints(docs_df).filter("id in (3, 4)").collect()
    by_id: dict[int, list[int]] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["fp"])
    assert 3 not in by_id                      # < k words: nothing
    assert len(by_id[4]) == 1                  # < w shingles: global min
    assert by_id[4][0] == min(_ref_fps(DOCS[3][1]))


def test_max_df_drops_hot_fingerprints(spark):
    # the same boilerplate text in 4 docs + one unique pair of dups:
    # with max_df=2 the boilerplate fingerprints (df=4) must not
    # produce pairs, while the unique near-dup pair survives
    docs = [(i, "common boiler plate text here all same") for i in
            range(1, 5)]
    docs += [(10, "unique alpha beta gamma delta epsilon zeta"),
             (11, "unique alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    pairs = {(r["id_a"], r["id_b"])
             for r in winnow_match_pairs(df, min_shared=1,
                                         max_df=2).collect()}
    assert pairs == {(10, 11)}
