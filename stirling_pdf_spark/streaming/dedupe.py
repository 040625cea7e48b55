"""Watermarked streaming exact-dedup over the events feed.

The streaming-native sibling of the batch exact-dedup keep-list
(operators/dedup.py): a 100 TB feed replays segments after upstream
retries, and the Spark-first answer is readStream ->
withWatermark -> dropDuplicatesWithinWatermark(key) -> append sink.
First arrival of a key is emitted immediately; every later copy that
lands within the watermark horizon hits the keyed state store and is
dropped; rows older than the watermark are discarded as late before
they reach the dedup operator, so nothing re-emits after state
eviction. The dedup horizon IS the watermark — size it to the
upstream replay window, which is what bounds the state store at
10^12 keys (the unbounded dropDuplicates would pin every key
forever).

The gate drives two availableNow runs: run 1 drains the feed plus an
in-run duplicate slice (event_id % 5 == 0 written twice), then the
ENTIRE feed is appended again and run 2 restarts from the checkpoint
— the recovered state store must drop every replayed row, so the
appended output equals the batch table bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .rollup import EVENTS_SCHEMA


def stream_dedup(spark, input_dir: str, out_dir: str,
                 checkpoint_dir: str, key: str = "event_id",
                 watermark: str = "8760 hours"):
    """Start (availableNow) a watermarked streaming dedup on ``key``:
    first arrival appended to ``out_dir`` with integer-exact columns
    (ts_us epoch micros, value_micro fixed-point), later copies
    dropped by the keyed state store. Returns the query."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_dir)
        # watermarks need TIMESTAMP (ltz); the session pins UTC so
        # the cast keeps the naive wall-clock verbatim
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([key])
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp_ltz"))
            .alias("ts_us"),
            "user_id", "event_type",
            F.floor(F.col("value") * F.lit(1000000.0)).cast("long")
            .alias("value_micro"),
        )
    )
    return (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
