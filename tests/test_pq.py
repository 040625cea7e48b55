"""Product-quantization ANN (operators/similarity.pq_topk): encode
codes are valid 1-based argmins, ADC ranking matches an independent
NumPy re-implementation exactly (including fp tie handling), and the
query rows themselves are excluded."""

from __future__ import annotations

import numpy as np
import pytest

from stirling_pdf_spark.operators.similarity import (
    make_planes, pq_codes_expr, pq_topk)

M, K, SUB = 4, 3, 4          # 16-dim vectors, 4 subspaces
CODEBOOKS = [make_planes(100 + m, K, SUB) for m in range(M)]


def _vectors(n):
    rng = np.random.default_rng(5)
    return rng.standard_normal((n, M * SUB)).round(4)


@pytest.fixture(scope="module")
def emb(spark):
    x = _vectors(40)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def _np_codes(x):
    cb = np.asarray(CODEBOOKS)          # (M, K, SUB)
    codes = np.zeros((len(x), M), dtype=int)
    for m in range(M):
        sub = x[:, m * SUB:(m + 1) * SUB].astype(np.float64)
        d = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d.argmin(axis=1) + 1          # 1-based
    return codes


def test_codes_valid_and_match_numpy(spark, emb):
    out = emb.select("vec_id", pq_codes_expr("embedding", CODEBOOKS)) \
        .collect()
    x = np.float32(_vectors(40))        # Spark stores float32
    expect = _np_codes(np.asarray(x))
    for r in out:
        got = r["codes"]
        assert len(got) == M and all(1 <= c <= K for c in got)
        assert list(got) == list(expect[r["vec_id"]])


def test_ivfpq_prunes_candidates_and_matches_numpy(spark, emb):
    from stirling_pdf_spark.operators.similarity import ivfpq_topk

    cents = make_planes(200, 3, M * SUB)      # 3 coarse cells
    queries = [0, 9]
    out = sorted((r["query_id"], r["rank"], r["neighbor_id"])
                 for r in ivfpq_topk(emb, cents, CODEBOOKS, queries,
                                     k=3, nprobe=2).collect())
    x = np.asarray(np.float32(_vectors(40)), dtype=np.float64)
    cb = np.asarray(CODEBOOKS)
    cents_np = np.asarray(cents)
    cd = ((x[:, None, :] - cents_np[None, :, :]) ** 2).sum(axis=2)
    cluster = cd.argmin(axis=1)
    codes = _np_codes(x) - 1
    expect = []
    for qid in queries:
        probes = set(np.argsort(cd[qid], kind="stable")[:2])
        luts = [((x[qid, m * SUB:(m + 1) * SUB][None, :] - cb[m]) ** 2)
                .sum(axis=1) for m in range(M)]
        cands = [i for i in range(len(x))
                 if i != qid and cluster[i] in probes]
        cands.sort(key=lambda i: (
            sum(luts[m][codes[i, m]] for m in range(M)), i))
        expect += [(qid, rank + 1, i) for rank, i in
                   enumerate(cands[:3])]
    assert out == sorted(expect)


def test_adc_ranking_matches_numpy(spark, emb):
    queries = [0, 5, 9]
    out = sorted((r["query_id"], r["rank"], r["neighbor_id"])
                 for r in pq_topk(emb, CODEBOOKS, queries, k=4).collect())
    x = np.asarray(np.float32(_vectors(40)), dtype=np.float64)
    cb = np.asarray(CODEBOOKS)
    codes = _np_codes(x) - 1
    expect = []
    for qid in queries:
        luts = [((x[qid, m * SUB:(m + 1) * SUB][None, :] - cb[m]) ** 2)
                .sum(axis=1) for m in range(M)]
        approx = np.array([
            sum(luts[m][codes[i, m]] for m in range(M))
            for i in range(len(x))])
        order = sorted(i for i in range(len(x)) if i != qid)
        order.sort(key=lambda i: (approx[i], i))
        expect += [(qid, rank + 1, i) for rank, i in
                   enumerate(order[:4])]
    assert out == sorted(expect)
