"""Distributed corpus materialization.

Two sources for the interleaved-docs table (both deterministic, no
external data):
  * ``synth_docs_df`` — archetype corpus from doc indices
    (spark.range -> mapInPandas(generator)); generation is distributed,
    so bench corpora never bottleneck on the driver;
  * ``docs_from_documents_table`` — derived 1:1 from the driver's
    read-only ``documents`` parquet via corpus.synth.synth_from_text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import DOCS_SCHEMA, read_table
from .synth import synth_doc, synth_from_text

_RAW_FIELDS = ("kind", "text", "media_ref", "offset")


def _raw_dicts(spans) -> list[dict]:
    return [dict(zip(_RAW_FIELDS, s)) for s in spans]


def synth_docs_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    mega_pages: tuple[int, int] = (1000, 1500),
    num_partitions: int | None = None,
) -> DataFrame:
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [synth_doc(int(i), seed, mega_pages) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "spans": [_raw_dicts(r[2]) for r in rows],
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=num_partitions)
        .mapInPandas(gen, DOCS_SCHEMA)
    )


def docs_from_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        for pdf in batches:
            out_ids, out_spans = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did, spans = synth_from_text(f"doc-{doc_id}", text or "")
                out_ids.append(did)
                out_spans.append(_raw_dicts(spans))
            yield pd.DataFrame({"doc_id": out_ids, "spans": out_spans})

    return docs.mapInPandas(gen, DOCS_SCHEMA)
