"""Tests for the eighth-session data-selection / audit operators:
DSIR importance selection, BPE fertility, classifier calibration
bins and the T5 span-corruption transform. Each pins closed-form
hand-computable cases, not just shapes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from stirling_pdf_spark.operators.packing import (
    SPAN_CORRUPT_LEN,
    SPAN_CORRUPT_PERIOD,
    span_corrupt_transform,
)
from stirling_pdf_spark.operators.textstats import (
    bpe_fertility,
    calibration_bins,
    dsir_select,
    dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string,"
                                 " lang string")


# ---------------------------------------------------------------- DSIR

def test_dsir_weights_favor_target_features(spark):
    # target docs say only 'aaa', raw background says only 'bbb';
    # the bucket holding 'aaa' must out-weigh the one holding 'bbb'
    rows = ([(i, "aaa", "en") for i in range(10)]
            + [(100 + i, "bbb", "de") for i in range(10)])
    w = dsir_weights(_docs(spark, rows),
                     F.col("lang") == "en").collect()
    by_bucket = {r["bucket"]: r for r in w}

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 256

    assert by_bucket[bucket("aaa")]["weight"] > 0
    assert by_bucket[bucket("bbb")]["weight"] < 0
    # single-token docs emit no bigrams: exactly 2 buckets counted
    assert len(by_bucket) == 2
    assert by_bucket[bucket("aaa")]["c_target"] == 10
    assert by_bucket[bucket("aaa")]["c_raw"] == 10
    assert by_bucket[bucket("bbb")]["c_target"] == 0


def test_dsir_select_ranks_target_like_docs_first(spark):
    # docs made of target-distribution words must outrank the rest;
    # tie-break inside each group is ascending id
    rows = ([(i, "good words here", "en") for i in range(3)]
            + [(10 + i, "junk junk junk", "de") for i in range(3)]
            + [(20, "good words here", "de")])  # target-LIKE, de
    out = dsir_select(_docs(spark, rows), k=7).collect()
    ranked = [r["id"] for r in out]
    # all 4 'good words here' docs (including the de one) lead
    assert set(ranked[:4]) == {0, 1, 2, 20}
    assert ranked[:3] == [0, 1, 2]  # asc-id tie-break
    assert [r["rank"] for r in out] == list(range(1, 8))


def test_dsir_bigrams_counted(spark):
    rows = [(1, "x y", "en")]
    w = dsir_weights(_docs(spark, rows), F.col("lang") == "en")
    # 2 unigrams + 1 bigram = 3 features
    assert w.agg(F.sum("c_raw")).collect()[0][0] == 3


# ----------------------------------------------------------- fertility

def test_bpe_fertility_closed_form(spark):
    # vocabulary 'ab' repeated: 6 merges collapse 'a b </w>' fully,
    # so n_sub for 'ab' == 1; fertility == 1 token per word
    rows = [(i, "ab ab ab", "en") for i in range(4)]
    out = bpe_fertility(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["lang"] == "en"
    assert r["n_words"] == 12
    assert r["n_chars"] == 24
    # 'a b </w>' -> 'ab </w>' -> 'ab</w>' within 6 merges
    assert r["n_tokens"] == 12
    assert r["fertility_ppm"] == 1_000_000
    assert r["chars_per_token_ppm"] == 2_000_000


def test_bpe_fertility_splits_rare_words(spark):
    # 'qz' appears once per doc next to dominant 'ab'; merges go to
    # the frequent word first, so the rare word stays multi-token and
    # the per-lang rollup separates the two languages
    rows = ([(i, "ab ab ab ab", "en") for i in range(6)]
            + [(100 + i, "qz", "fr") for i in range(2)])
    out = {r["lang"]: r for r in
           bpe_fertility(_docs(spark, rows)).collect()}
    assert out["en"]["fertility_ppm"] == 1_000_000
    assert out["fr"]["n_words"] == 2
    assert out["fr"]["n_tokens"] >= 2  # never fully merged
    assert out["fr"]["fertility_ppm"] >= 1_000_000


# --------------------------------------------------------- calibration

def test_calibration_bins_integrity(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = calibration_bins(docs).collect()
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in out) == n_docs
    assert all(0 <= r["bin"] <= 9 for r in out)
    for r in out:
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert r["pos_rate_x1000"] == r["n_pos"] * 1000 // r["n_docs"]


def test_calibration_single_score_degenerate(spark):
    # all docs identical -> one bin (bin 0), exact sums
    rows = [(i, "same text", "en") for i in range(5)]
    out = calibration_bins(_docs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["bin"] == 0
    assert out[0]["n_docs"] == 5
    assert out[0]["n_pos"] == 5
    assert out[0]["pos_rate_x1000"] == 1000


# -------------------------------------------------------- span corrupt

def _expected_corruption(doc_id: int, words: list[str]):
    s = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8],
            16) % 11
    p, ln = SPAN_CORRUPT_PERIOD, SPAN_CORRUPT_LEN
    inp, tgt, masked = [], [], 0
    for i, w in enumerate(words):
        off = i % p - s
        if off == 0:
            inp.append(f"<extra_id_{i // p}>")
            tgt.append(f"<extra_id_{i // p}> {w}")
            masked += 1
        elif 0 < off < ln:
            tgt.append(w)
            masked += 1
        else:
            inp.append(w)
    return " ".join(inp), " ".join(tgt), masked


@pytest.mark.parametrize("n_words", [1, 5, 11, 13, 14, 30])
def test_span_corrupt_matches_python_model(spark, n_words):
    words = [f"w{j}" for j in range(n_words)]
    rows = [(i, " ".join(words), "en") for i in range(7)]
    out = {r["id"]: r for r in
           span_corrupt_transform(_docs(spark, rows)).collect()}
    for doc_id in range(7):
        inp, tgt, masked = _expected_corruption(doc_id, words)
        r = out[doc_id]
        assert r["n_tokens"] == n_words
        assert r["n_masked"] == masked
        assert r["input_text"] == inp
        assert r["target_text"] == tgt


def test_span_corrupt_rate_near_target(spark, sf_smoke):
    # the schedule masks 3/13 ~ 23% of tokens in long docs, less in
    # short ones (spans truncated by doc end); corpus-wide the rate
    # must land strictly between 5% and 3/13
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    agg = span_corrupt_transform(docs).agg(
        F.sum("n_masked").alias("m"), F.sum("n_tokens").alias("n")
    ).collect()[0]
    rate = agg["m"] / agg["n"]
    assert 0.05 < rate <= 3 / 13 + 0.01
