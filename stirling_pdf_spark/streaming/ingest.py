"""Continuous ingestion of the interleaved docs table via Structured
Streaming.

The reference is strictly request-scoped batch (SURVEY.md §2.6
"Streaming: none"), and the north rule asks for batch-with-checkpoint;
this module is the bridge for the continuous-arrival case a 100 TB
corpus actually has: new doc files land, the stream picks them up, and
each micro-batch runs through the SAME checkpointed extraction commit
protocol (runtime/checkpoint.py), so stream and batch share one
idempotence story:

    readStream(docs dir) -> foreachBatch(run_extract_with_checkpoint)

Exactly-once visible output holds even if a micro-batch is replayed
after a crash: replayed docs are dropped by the lineage anti-join, and
a half-written batch is invisible until its lineage commit. Spark's own
streaming checkpoint (source offsets) composes with, not replaces, the
lineage table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..runtime.checkpoint import run_extract_with_checkpoint
from ..sources.tables import DOCS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **extract_kwargs,
):
    """Start (and with availableNow, drain) a streaming extraction.
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        run_extract_with_checkpoint(
            batch_df.sparkSession, batch_df, out_dir,
            run_id=f"stream-{batch_id}", **extract_kwargs,
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
