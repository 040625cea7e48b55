"""Stream-stream attribution join (views -> purchases).

The fourth Structured Streaming shape after ingest/rollup/dedup/pack:
a watermarked stream-stream INNER join with an event-time range
condition — every purchase pairs with ALL of the same user's views in
the trailing lookback window (the marketing-attribution join; the
as-of single-match variant is the batch operator
relational.events_asof). Both sides carry watermarks, so the join
state store evicts rows once the watermark passes the range bound —
bounded state at any feed size, the property a 10^12-event stream
needs. Inner-join matches emit as soon as both rows are present, and
with availableNow triggers the drained output equals the batch join
bit-for-bit, which is exactly what the DuckDB oracle certifies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .rollup import EVENTS_SCHEMA


def stream_attribution_join(spark, views_dir: str, purchases_dir: str,
                            out_dir: str, checkpoint_dir: str,
                            lookback_hours: int = 2):
    """Start (availableNow) the watermarked view->purchase join:
    (purchase_id, user_id, purchase_us, view_id, view_us) appended to
    ``out_dir``. Returns the query."""

    def read(d, prefix):
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "64").parquet(d)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .select(F.col("event_id").alias(f"{prefix}_id"),
                    F.col("user_id").alias(f"{prefix}_user"),
                    F.col("ts").alias(f"{prefix}_ts"))
        )

    v = read(views_dir, "view")
    p = read(purchases_dir, "purchase")
    joined = p.join(
        v,
        F.expr(f"""
            purchase_user = view_user
            AND view_ts <= purchase_ts
            AND view_ts >= purchase_ts - interval {lookback_hours} hours
        """),
    ).select(
        F.col("purchase_id"),
        F.col("purchase_user").alias("user_id"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.col("view_id"),
        F.unix_micros("view_ts").alias("view_us"),
    )
    return (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
