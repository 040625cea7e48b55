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
