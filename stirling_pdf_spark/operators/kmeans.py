"""Distributed Lloyd's k-means over embedding columns, exactly
reproducible across engines and cluster sizes.

The trick that makes an ITERATIVE float algorithm oracle-checkable:
vectors are quantized once to integer micro units (floor(x * 1e6)).
Squared distances are then sums of integer products (< 2^53, so exact
in float64 REGARDLESS of summation order), and centroid updates are
floor(integer sum / count) — so every iteration is bit-identical
between Spark and the DuckDB oracle, and between 8 and 8000 executors
(plain float means would differ with aggregation order).

Distributed shape per iteration: centroids ride as literal arrays
(k x dim values — the broadcast-as-literal pattern from ivf.py), the
assignment is a pure column expression over one scan, and the update
is one groupBy(cluster) with 64 integer SUMs. The only driver state is
the k x dim centroid table (the sanctioned bounded collect). Clusters
that lose all members keep their previous centroid.

This is the corpus-clustering stage LLM pipelines run for topic
balancing / semdedup sharding; IVF (ivf.py) trains on a bounded sample
instead — this operator is the full-corpus refinement of the same
quantizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _micro_col(vec_col: str):
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * MICRO).cast("long"),
    )


def _dist_sq(vm_col, centroid: list[int]):
    arr = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vm_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_assign(df: DataFrame, k: int = 4, iters: int = 3,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds (the
    vectors with ids 0..k-1) and return the final assignment:
    (vec_id, cluster, dist_sq) with dist_sq in micro^2 units, argmin
    ties to the lower cluster id."""
    from ..runtime.staging import stage

    ve = stage(df.select(F.col(id_col).alias("id"),
                         _micro_col(vec_col).alias("vm")))
    dim = ve.select(F.size("vm").alias("d")).first()["d"]

    seeds = {r["id"]: list(r["vm"])
             for r in ve.filter(F.col("id") < k).collect()}
    if len(seeds) < k:
        raise ValueError(f"need ids 0..{k - 1} as seeds, got {sorted(seeds)}")
    centroids = [seeds[i] for i in range(k)]

    def assign(cents: list[list[int]]) -> DataFrame:
        pairs = F.array(*[
            F.struct(_dist_sq(F.col("vm"), c).alias("d"),
                     F.lit(j).cast("long").alias("cluster"))
            for j, c in enumerate(cents)
        ])
        best = F.array_min(pairs)
        return ve.select("id", "vm", best["cluster"].alias("cluster"),
                         best["d"].alias("dist_sq"))

    for _ in range(iters):
        assigned = assign(centroids)
        agg = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("vm", i + 1)).alias(f"s{i}")
              for i in range(dim)],
        ).collect()
        new_c = list(centroids)  # empty clusters keep their centroid
        for row in agg:
            j = int(row["cluster"])
            n = int(row["n"])
            new_c[j] = [int(row[f"s{i}"]) // n for i in range(dim)]
        centroids = new_c

    return assign(centroids).select("id", "cluster", "dist_sq")
