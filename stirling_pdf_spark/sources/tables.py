"""Table readers.

Parquet is the sandbox storage; production storage is Iceberg (the
north rule's snapshot/checkpoint source). The Iceberg path is gated
behind a runtime check because the sandbox image has no Iceberg jars —
the reader API is identical (``spark.read.format("iceberg")``), so the
pipeline code is storage-agnostic: it takes DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

RAW_SPAN_STRUCT = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("media_ref", T.StringType(), True),
    T.StructField("offset", T.IntegerType(), False),
])

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(RAW_SPAN_STRUCT), False),
])


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TPCH_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_docs(spark: SparkSession, path: str, storage: str = "parquet") -> DataFrame:
    """Read the interleaved-docs table (input_hint shape)."""
    if storage == "iceberg":
        try:
            return spark.read.format("iceberg").load(path)
        except Exception as exc:  # jars absent in the sandbox image
            raise NotImplementedError(
                "Iceberg jars not on the classpath in this environment; "
                "use storage='parquet'"
            ) from exc
    return spark.read.schema(DOCS_SCHEMA).parquet(path)
