"""Idempotent, resumable extraction runs with per-partition lineage and
metrics (the north rule's checkpoint/resume + observability surface).

Storage layout under ``out_dir`` (Parquet in the sandbox; the
production analogue is an Iceberg table per dataset, where the lineage
commit below corresponds to an Iceberg snapshot commit):

    spans/run_id=<run_id>/    (doc_id, spans, partition_id)
    metrics/                  (run_id, partition_id, doc_count,
                               span_count, text_bytes, wall_ms)
    lineage/                  (doc_id, run_id, partition_id, committed_at)

Commit protocol — lineage is written LAST and is the commit point:
  1. pending = docs ANTI JOIN lineage ON doc_id   (resume)
  2. extract -> write spans/run_id=...            (data, not yet visible)
  3. write metrics                                 (observability)
  4. write lineage                                 (COMMIT)
A crash between 2 and 4 leaves orphan span files that are never joined
by readers (``read_committed_spans`` inner-joins lineage), and the next
run re-extracts those docs under a new run_id — exactly-once *visible*
output with at-least-once execution, the same contract Iceberg
snapshots give.

The reference restarts failed jobs from scratch (TaskManager /
JobExecutorService have no persistence of partial results); this module
is the scale-out replacement (SURVEY.md §4 "Idempotent resume").
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract_pipeline import extract_spans


def _try_read(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # first run: directory doesn't exist yet


def committed_doc_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    lineage = _try_read(spark, f"{out_dir}/lineage")
    if lineage is None:
        return None
    return lineage.select("doc_id").distinct()


def pending_docs(spark: SparkSession, docs: DataFrame, out_dir: str) -> DataFrame:
    """Resume filter: drop docs already committed by any previous run.
    One shuffle on doc_id; at scale the lineage side is a bloom-filter
    or broadcast candidate when much smaller than the corpus."""
    committed = committed_doc_ids(spark, out_dir)
    if committed is None:
        return docs
    return docs.join(committed, "doc_id", "left_anti")


def run_extract_with_checkpoint(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    **extract_kwargs,
) -> dict:
    """Execute one resumable extraction run. Returns a summary dict
    {run_id, docs_done, spans_done, wall_ms, resumed_skipped}."""
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.time()

    pending = pending_docs(spark, docs, out_dir)
    if pending.isEmpty():
        # nothing uncommitted — crucial for replayed run_ids (e.g. a
        # re-triggered streaming micro-batch whose lineage already
        # committed): we must NOT touch the committed span files
        return {"run_id": run_id, "docs_done": 0, "spans_done": 0,
                "wall_ms": int((time.time() - t0) * 1000)}
    out = (
        extract_spans(pending, **extract_kwargs)
        .withColumn("partition_id", F.spark_partition_id())
    )
    span_path = f"{out_dir}/spans/run_id={run_id}"
    # overwrite: a crashed attempt under the same run_id left orphan
    # files that lineage never committed — safe to replace
    out.write.mode("overwrite").parquet(span_path)

    back = spark.read.parquet(span_path)
    wall_ms = int((time.time() - t0) * 1000)

    metrics = (
        back.groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).alias("span_count"),
            F.sum(F.aggregate(
                "spans", F.lit(0).cast("long"),
                lambda acc, s: acc + F.coalesce(F.octet_length(s["text"]),
                                                F.lit(0)),
            )).alias("text_bytes"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_ms", F.lit(wall_ms))
    )
    metrics.write.mode("append").parquet(f"{out_dir}/metrics")

    lineage = (
        back.select("doc_id", "partition_id")
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
    )
    lineage.write.mode("append").parquet(f"{out_dir}/lineage")  # COMMIT

    stats = metrics.agg(
        F.sum("doc_count").alias("d"), F.sum("span_count").alias("s")
    ).collect()[0]
    return {
        "run_id": run_id,
        "docs_done": stats["d"] or 0,
        "spans_done": stats["s"] or 0,
        "wall_ms": wall_ms,
    }


def read_committed_spans(spark: SparkSession, out_dir: str) -> DataFrame:
    """Visible output = span rows whose (doc_id, run_id) is committed in
    lineage. Orphans from crashed runs are excluded; if a doc was
    committed twice (re-run after a lineage-write race), the latest
    committed_at wins."""
    spans = spark.read.option("basePath", f"{out_dir}/spans").parquet(
        f"{out_dir}/spans"
    )
    lineage = spark.read.parquet(f"{out_dir}/lineage")
    latest = (
        lineage.groupBy("doc_id")
        .agg(F.max_by("run_id", "committed_at").alias("run_id"))
    )
    return spans.join(latest, ["doc_id", "run_id"], "inner").select(
        "doc_id", "spans"
    )


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/metrics")


def compact_small_files(spark: SparkSession, path: str,
                        target_file_bytes: int = 128 << 20) -> dict:
    """Bin-packing rewrite of a parquet table directory — the
    small-files maintenance pass for the append-heavy lineage/metrics
    tables (each run appends a handful of tiny files; after 10^4 runs
    the listing, not the data, dominates read cost — the same reason
    Iceberg ships rewrite_data_files).

    Shuffle-free: the table is read once and coalesce()d down to
    ceil(total_bytes / target_file_bytes) output files, written to a
    sibling temp dir, then swapped in. Same single-writer maintenance
    window as expire_orphan_runs — never run concurrently with an
    in-flight run. Returns {files_before, files_after, bytes}."""
    import math
    import os
    import shutil

    def parquet_files(root: str) -> list[str]:
        return [os.path.join(r, f) for r, _, fs in os.walk(root)
                for f in fs if f.endswith(".parquet")]

    if not os.path.isdir(path):
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    before = parquet_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if len(before) <= n_out:
        return {"files_before": len(before), "files_after": len(before),
                "bytes": total}
    tmp = path + ".compact-tmp"
    old = path + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_out).write.parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": len(before),
            "files_after": len(parquet_files(path)), "bytes": total}


def compact_checkpoint_tables(spark: SparkSession, out_dir: str,
                              target_file_bytes: int = 128 << 20) -> dict:
    """Compact the lineage and metrics tables of a checkpointed output
    root. Span data is left alone — it is partitioned by run_id and
    committed; rewriting it would invalidate nothing but gains little
    (extraction already writes full-size files)."""
    return {
        "lineage": compact_small_files(
            spark, f"{out_dir}/lineage", target_file_bytes),
        "metrics": compact_small_files(
            spark, f"{out_dir}/metrics", target_file_bytes),
    }


def expire_orphan_runs(spark: SparkSession, out_dir: str) -> list[str]:
    """Garbage-collect span directories whose run_id never committed to
    lineage (crashed attempts) — the analogue of Iceberg's
    remove-orphan-files maintenance. Committed data is never touched;
    returns the removed run_ids. Safe to run any time EXCEPT
    concurrently with an in-flight run (its files look orphaned until
    the lineage commit)."""
    import os
    import shutil

    spans_root = f"{out_dir}/spans"
    if not os.path.isdir(spans_root):
        return []
    lineage = _try_read(spark, f"{out_dir}/lineage")
    committed = set()
    if lineage is not None:
        committed = {
            r["run_id"] for r in lineage.select("run_id").distinct().collect()
        }
    removed = []
    for entry in os.listdir(spans_root):
        if not entry.startswith("run_id="):
            continue
        run_id = entry.split("=", 1)[1]
        if run_id not in committed:
            shutil.rmtree(os.path.join(spans_root, entry))
            removed.append(run_id)
    return removed
