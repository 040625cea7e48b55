"""Corpus serialization & holdout assignment — the last-mile ops of a
training-data pipeline.

``hash_split``: deterministic content-hash train/val/test assignment.
Splitting by hash OF THE TEXT (not by row number or random()) is the
standard trick that keeps the holdout stable under re-shuffles,
re-partitioning and dedup re-runs, and puts exact duplicates in the
same split (no train/test leakage through copies). Pure column
algebra: md5 -> first 4 bytes as an integer -> permille bucket.

``to_jsonl``: one JSON object per document — the serialization LLM
training corpora actually ship as. Uses Spark's native to_json
(JVM-side JacksonGenerator, no UDF); key order is the struct field
order, so the line shape is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_PERMILLE = (980, 990)  # train < 980 <= val < 990 <= test


def hash_split(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, bucket, split) — bucket = permille of the first 4 md5
    bytes of the text; split thresholds 98.0%/1.0%/1.0%."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(text_col).cast("binary")), 1, 8),
               16, 10).cast("long") % 1000
    )
    train, val = SPLIT_PERMILLE
    return df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < train, "train")
        .when(bucket < val, "val")
        .otherwise("test").alias("split"),
    )


def to_jsonl(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, line) — the {"doc_id":...,"text":...} JSONL record."""
    return df.select(
        F.col(id_col),
        F.to_json(F.struct(F.col(id_col), F.col(text_col)))
        .alias("line"),
    )


def build_training_corpus(df: DataFrame, seq_len: int = 512,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """The composed end-to-end training-corpus pipeline — each stage
    is the already-gated operator, chained the way a real pretraining
    data build runs them:

      1. Gopher quality rules (textstats.gopher_quality_filter),
      2. exact dedup, first occurrence per content hash wins,
      3. content-hash holdout split, train slice only (hash_split),
      4. concat-and-chunk sequence packing (packing.pack_sequences).

    Output = pack_sequences' schema over the surviving docs. The gate
    over this function pins COMPOSITION (stage order, join keys,
    survivor sets), not the per-stage rules — those have their own
    oracles. Plan shape: three map-only filters/joins (quality,
    dedup keep-list, split) feeding the packer's two-phase prefix
    sum; the dedup groupBy is the only extra shuffle."""
    from .packing import pack_sequences
    from .textstats import gopher_quality_filter

    kept = (
        gopher_quality_filter(df, id_col=id_col, text_col=text_col)
        .filter(F.col("keep") == 1)
        .select(F.col("id").alias(id_col))
    )
    base = df.join(kept, id_col).select(id_col, text_col)
    firsts = base.groupBy(
        F.md5(F.col(text_col).cast("binary")).alias("h")
    ).agg(F.min(id_col).alias(id_col))
    dd = base.join(firsts.select(id_col), id_col)
    train = (
        hash_split(dd, id_col=id_col, text_col=text_col)
        .filter(F.col("split") == "train").select(id_col)
    )
    final = dd.join(train, id_col)
    return pack_sequences(final, seq_len=seq_len,
                          id_col=id_col, text_col=text_col)
