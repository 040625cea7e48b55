"""Tests for mutual-kNN pair mining (similarity.mutual_knn_pairs) —
the bitext-style alignment stage: even-id side vs odd-id side, a pair
survives only when each member is in the other's cosine top-k."""

from __future__ import annotations

from stirling_pdf_spark.operators.similarity import mutual_knn_pairs


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_mutual_knn_closed_form(spark):
    # engineered 2-D corpus: ids 0/2/4 pair cleanly with 1/3/5; id 6
    # points at id 1 (already taken by 0 at rank 1) and id 7 points at
    # id 6 — neither is MUTUAL at k=1, so both drop.
    rows = [
        (0, (1.0, 0.0)), (2, (0.0, 1.0)), (4, (-1.0, 0.0)),
        (6, (0.9, 0.1)),
        (1, (1.0, 0.01)), (3, (0.01, 1.0)), (5, (-1.0, 0.02)),
        (7, (0.7, 0.7)),
    ]
    out = {(r["id_a"], r["id_b"]): (r["rank_ab"], r["rank_ba"])
           for r in mutual_knn_pairs(_emb(spark, rows), k=1).collect()}
    assert out == {(0, 1): (1, 1), (2, 3): (1, 1), (4, 5): (1, 1)}


def test_mutual_knn_is_subset_of_both_directions(spark):
    # determinism + the defining property: every emitted pair carries
    # ranks within k on BOTH sides, and raising k only adds pairs.
    rows = [(i, ((i * 7 + 3) % 11 - 5.0, (i * 5 + 1) % 13 - 6.0,
                 (i * 3 + 2) % 7 - 3.0)) for i in range(20)]
    k2 = mutual_knn_pairs(_emb(spark, rows), k=2).collect()
    assert k2, "k=2 over 10x10 sides must produce at least one pair"
    for r in k2:
        assert r["id_a"] % 2 == 0 and r["id_b"] % 2 == 1
        assert 1 <= r["rank_ab"] <= 2 and 1 <= r["rank_ba"] <= 2
    k3 = {(r["id_a"], r["id_b"])
          for r in mutual_knn_pairs(_emb(spark, rows), k=3).collect()}
    assert {(r["id_a"], r["id_b"]) for r in k2} <= k3
