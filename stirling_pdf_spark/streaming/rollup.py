"""Watermarked tumbling-window aggregation over the events stream.

The streaming-native sibling of relational.events_hourly_rollup: the
reference is strictly request-scoped batch (SURVEY.md §2.6), but a
100 TB event feed arrives continuously, and the Spark-first answer is
readStream -> withWatermark -> window() -> append-mode sink. Append
mode only emits a window once the watermark passes its end, so every
emitted row is FINAL — exactly-once per window without any dedup
bookkeeping, surviving restarts off the streaming checkpoint (state
store + source offsets + watermark all recover).

The gate drives it in two availableNow runs: run 1 drains the real
events (late-window rows stay buffered in state), then a sentinel
event 3 hours past the corpus max lands and run 2 RESTARTS from the
checkpoint, pushes the watermark past every real window's end, and
flushes the remaining state — so both the finalization rule and the
cross-restart state recovery are what the oracle certifies; the
result must equal the batch rollup bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# parquet stores the synthetic feed's naive timestamps as NTZ; the
# session pins UTC so the ltz cast used for epoch math is the identity
EVENTS_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                 "event_type string, value double, props string")


def stream_hourly_rollup(spark, input_dir: str, out_dir: str,
                         checkpoint_dir: str,
                         watermark: str = "1 hour"):
    """Start (availableNow) a watermarked hourly rollup:
    (hour_epoch, event_type, n_events, sum_value_micro) appended to
    ``out_dir`` once each window finalizes. Returns the query."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_dir)
        # watermarks require TIMESTAMP (ltz); under the session's
        # pinned UTC the cast keeps the naive wall-clock verbatim
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * F.lit(1000000.0)).cast("long"))
            .alias("sum_value_micro"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type", "n_events", "sum_value_micro",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
