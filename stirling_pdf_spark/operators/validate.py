"""Span-sequence equality validation between two extraction runs.

The north rule's per-row invariant — (kind, text, media_ref, order)
sequence equality against the reference — expressed as a first-class
distributed operator: given two span tables keyed by (doc_id, order),
report per document whether the sequences are identical and where they
first diverge. This is the tool a migration runs at 100 TB to certify
"new extractor == old extractor" without collecting anything: one
full-outer shuffle join on (doc_id, order) followed by a partial-agg'd
groupBy, both on the same key, so AQE coalesces them into a single
exchange.

Reference analogue: the repo's own span-equality test strategy
(SURVEY.md §5) — the reference checks extraction outputs per page in
JUnit (e.g. app/core/src/test java GetInfoOnPDF / page-extraction
tests); here the check itself is data-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "order",
) -> DataFrame:
    """Compare two span tables with identical schemas keyed by
    (id_col, order_col); every other shared column is payload.

    Output, one row per document present on either side:
      (doc_id, n_a, n_b, n_mismatch, equal:int, first_diverge:long)
    where a mismatch is a (doc_id, order) slot missing from one side
    or any payload column differing (null-safe); first_diverge is the
    smallest mismatching order, -1 when the sequences are equal.
    """
    payload = sorted(
        c for c in a.columns
        if c in set(b.columns) and c not in (id_col, order_col)
    )
    if not payload:
        raise ValueError("span_diff: no shared payload columns")

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.col(order_col).cast("long").alias("ord"),
            F.struct(*[F.col(c) for c in payload]).alias(f"p_{tag}"),
        )

    j = side(a, "a").join(side(b, "b"), ["doc_id", "ord"], "full_outer")
    mism = F.when(
        F.col("p_a").isNull() | F.col("p_b").isNull()
        | ~F.col("p_a").eqNullSafe(F.col("p_b")),
        F.lit(1),
    ).otherwise(F.lit(0))
    per_slot = j.select(
        "doc_id", "ord", mism.alias("mism"),
        F.col("p_a").isNotNull().cast("int").alias("in_a"),
        F.col("p_b").isNotNull().cast("int").alias("in_b"),
    )
    return per_slot.groupBy("doc_id").agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum("mism").cast("long").alias("n_mismatch"),
        (F.sum("mism") == 0).cast("int").alias("equal"),
        F.coalesce(
            F.min(F.when(F.col("mism") == 1, F.col("ord"))), F.lit(-1)
        ).cast("long").alias("first_diverge"),
    )


def snapshot_diff(old: DataFrame, new: DataFrame,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Snapshot-to-snapshot corpus diff — the CDC stage an
    incremental extraction run executes first (only 'added'/'changed'
    docs re-extract; 'removed' docs tombstone downstream): one
    full-outer hash join on the document key comparing content md5,
    no collection, no ordering assumption — so the plan is a single
    exchange at any corpus size (the Iceberg snapshot-incremental
    shape, computed engine-side).

    Output: (doc_id, status) with status in
    added | removed | changed | unchanged.
    """
    o = old.select(F.col(id_col).alias("doc_id"),
                   F.md5(F.col(text_col).cast("binary")).alias("h_old"))
    n = new.select(F.col(id_col).alias("doc_id"),
                   F.md5(F.col(text_col).cast("binary")).alias("h_new"))
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed")))
    return j.select("doc_id", status.alias("status"))


def scd2_history(old: DataFrame, new: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Slowly-changing-dimension type-2 history across two snapshots —
    snapshot_diff's sibling that MATERIALIZES the versioned table a
    warehouse keeps (one row per document version, validity interval
    as snapshot numbers, current flag):

      unchanged -> one open v1 row;   changed -> closed v1 + open v2;
      removed   -> closed v1;         added   -> open v2.

    Same single full-outer hash join as snapshot_diff, then each
    branch emits its rows with closed-form columns — no windows, no
    extra shuffle (the union branches reuse the join output).
    Output: (doc_id, version, content_hash, valid_from, valid_to
    — NULL while open, is_current int)."""
    o = old.select(F.col(id_col).alias("doc_id"),
                   F.md5(F.col(text_col).cast("binary")).alias("h_old"))
    n = new.select(F.col(id_col).alias("doc_id"),
                   F.md5(F.col(text_col).cast("binary")).alias("h_new"))
    j = o.join(n, "doc_id", "full_outer")
    ho, hn = F.col("h_old"), F.col("h_new")
    changed = ho.isNotNull() & hn.isNotNull() & (ho != hn)
    v1 = j.filter(ho.isNotNull()).select(
        "doc_id", F.lit(1).cast("long").alias("version"),
        ho.alias("content_hash"),
        F.lit(1).cast("long").alias("valid_from"),
        F.when(changed | hn.isNull(), F.lit(2)).cast("long")
        .alias("valid_to"),
        F.when(changed | hn.isNull(), F.lit(0)).otherwise(F.lit(1))
        .cast("int").alias("is_current"),
    )
    v2 = j.filter(changed | ho.isNull()).select(
        "doc_id", F.lit(2).cast("long").alias("version"),
        hn.alias("content_hash"),
        F.lit(2).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(1).cast("int").alias("is_current"),
    )
    return v1.unionByName(v2)
