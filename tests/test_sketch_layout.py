"""Deterministic HLL / Bloom sketches and Z-order layout."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stirling_pdf_spark.operators.layout import zorder_manifest
from stirling_pdf_spark.operators.sketch import (
    HLL_BUCKETS,
    HLL_LC_TABLE,
    bloom_decontaminate,
    hll_distinct,
    hll_registers,
)


def _py_rho(value: str) -> tuple[int, int]:
    """Reference bucket/rank from the md5 slice contract."""
    h = hashlib.md5(value.encode()).hexdigest()
    bucket = int(h[:2], 16)
    w = h[2:14]
    z = len(w) - len(w.lstrip("0"))
    if z == 12:
        return bucket, 49
    v = int(w[z], 16)
    nz = 0 if v >= 8 else 1 if v >= 4 else 2 if v >= 2 else 3
    return bucket, 4 * z + nz + 1


class TestHll:
    def test_registers_match_python_model(self, spark):
        df = spark.createDataFrame(
            [("k", i) for i in range(50)], "key string, user_id long")
        got = {(r["bucket"]): r["reg"]
               for r in hll_registers(df, "key", "user_id").collect()}
        expect: dict[int, int] = {}
        for i in range(50):
            b, rho = _py_rho(str(i))
            expect[b] = max(expect.get(b, 0), rho)
        assert got == expect

    def test_sketch_merges_across_partitionings(self, spark):
        df = spark.createDataFrame(
            [("k", i % 700) for i in range(5000)],
            "key string, user_id long")
        a = hll_distinct(df.repartition(1), "key", "user_id").collect()[0]
        b = hll_distinct(df.repartition(13), "key", "user_id").collect()[0]
        assert a.asDict() == b.asDict()

    def test_small_range_uses_linear_counting(self, spark):
        df = spark.createDataFrame(
            [("k", i) for i in range(150)], "key string, user_id long")
        row = hll_distinct(df, "key", "user_id").collect()[0]
        v = HLL_BUCKETS - row["n_buckets_used"]
        assert row["est_distinct"] == HLL_LC_TABLE[v - 1]
        assert row["exact_distinct"] == 150
        # LC keeps small-range error inside ~10%
        assert row["err_bp"] <= 1000


class TestBloom:
    def test_no_false_negatives_and_flags_are_int(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta iota"
        docs = spark.createDataFrame(
            [(0, shared + " tail tail tail"),
             (1, "unique words only here nothing matches benchmark "
                 "content at all today")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, shared + " coda")], "doc_id long, text string")
        rows = {r["id"]: r for r in
                bloom_decontaminate(docs, bench, n=8).collect()}
        assert rows[0]["exact_flag"] == 1
        assert rows[0]["bloom_flag"] == 1  # bloom never misses a real hit
        assert rows[1]["exact_flag"] == 0
        assert isinstance(rows[0]["bloom_flag"], int)

    def test_short_docs_have_zero_grams(self, spark):
        docs = spark.createDataFrame(
            [(0, "too short")], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(1, "a b c d e f g h i")], "doc_id long, text string")
        row = bloom_decontaminate(docs, bench, n=8).collect()[0]
        assert row["n_grams"] == 0 and row["bloom_flag"] == 0


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


class TestZorder:
    def test_interleave_matches_python_and_files_partition_z(self, spark):
        docs = spark.createDataFrame(
            [(i, f"src{i % 7}", (i * 37) % 900) for i in range(400)],
            "doc_id long, source string, n_chars long")
        man = {r["file_id"]: r for r in zorder_manifest(docs).collect()}
        assert sum(r["n_docs"] for r in man.values()) == 400
        # every file covers a disjoint fixed Z range
        for fid, r in man.items():
            assert fid * 1024 <= r["min_z"] <= r["max_z"] < (fid + 1) * 1024
        # spot-check the morton math on one doc
        x = int(hashlib.md5(b"src3").hexdigest()[:2], 16)
        y = min(255, ((3 * 37) % 900) // 4)
        fid = _py_morton(x, y) // 1024
        assert fid in man

    def test_clustering_narrows_file_ranges(self, spark):
        # naive layout (by doc_id) would put ~every x value in every
        # file; z-order files must each span < half the x domain
        docs = spark.createDataFrame(
            [(i, f"src{i % 97}", (i * 13) % 1024) for i in range(2000)],
            "doc_id long, source string, n_chars long")
        man = zorder_manifest(docs).collect()
        spans = [r["max_x"] - r["min_x"] for r in man]
        assert sum(spans) / len(spans) < 128


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    from stirling_pdf_spark.operators.sketch import cms_heavy_estimates

    docs = spark.createDataFrame(
        [(1, "x x x y y z"), (2, "x y q")],
        "doc_id long, text string")
    rows = {r["term"]: r for r in cms_heavy_estimates(
        docs, k=4).collect()}
    assert rows["x"]["true_cnt"] == 4
    assert set(rows) == {"x", "y", "z", "q"}
    for r in rows.values():
        assert r["overestimate"] >= 0
        assert r["est_cnt"] >= r["true_cnt"]
    # 4 distinct terms in 4x256 cells: collisions are possible but a
    # row without collision must bound est to the true count
    assert rows["x"]["est_cnt"] == 4  # depth-4 min finds a clean row


def test_cms_cells_bounded_and_mergeable_by_sum(spark):
    from stirling_pdf_spark.operators.sketch import cms_cells

    df1 = spark.createDataFrame([("a",), ("b",)], "term string")
    df2 = spark.createDataFrame([("a",), ("c",)], "term string")
    both = df1.union(df2)
    cells_union = {(r["row"], r["col"]): r["cnt"]
                   for r in cms_cells(both, "term").collect()}
    from collections import Counter
    merged = Counter()
    for d in (df1, df2):
        for r in cms_cells(d, "term").collect():
            merged[(r["row"], r["col"])] += r["cnt"]
    assert dict(merged) == cells_union
    assert len(cells_union) <= 4 * 256
