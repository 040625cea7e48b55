"""Checkpoint/resume semantics: anti-join resume, lineage commit point,
orphan invisibility, metrics accounting."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stirling_pdf_spark.corpus.spark_synth import synth_docs_df
from stirling_pdf_spark.operators.extract_pipeline import extract_spans
from stirling_pdf_spark.runtime.checkpoint import (
    read_committed_spans,
    read_metrics,
    run_extract_with_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return synth_docs_df(spark, 40, mega_pages=(40, 50), num_partitions=4)


def test_resume_skips_committed(spark, docs, tmp_path):
    out = str(tmp_path / "ckpt")
    first_half = docs.filter(F.xxhash64("doc_id") % 2 == 0)
    r1 = run_extract_with_checkpoint(spark, first_half, out, run_id="r1",
                                     num_partitions=4)
    assert r1["docs_done"] == first_half.count() > 0

    r2 = run_extract_with_checkpoint(spark, docs, out, run_id="r2",
                                     num_partitions=4)
    assert r2["docs_done"] == 40 - r1["docs_done"]

    committed = read_committed_spans(spark, out)
    assert committed.count() == 40
    # committed output == direct full extraction (same spans per doc)
    direct = extract_spans(docs, num_partitions=4)
    joined = committed.alias("a").join(direct.alias("b"), "doc_id")
    assert joined.count() == 40
    mismatches = joined.filter(F.col("a.spans") != F.col("b.spans")).count()
    assert mismatches == 0

    # a third run over the same corpus is a no-op
    r3 = run_extract_with_checkpoint(spark, docs, out, run_id="r3",
                                     num_partitions=4)
    assert r3["docs_done"] == 0


def test_orphan_spans_invisible(spark, docs, tmp_path):
    out = str(tmp_path / "ckpt")
    run_extract_with_checkpoint(spark, docs, out, run_id="r1",
                                num_partitions=4)
    # simulate a crash after the span write, before the lineage commit:
    # span files exist under a run_id that lineage never recorded
    orphan = extract_spans(docs.limit(3), num_partitions=2).withColumn(
        "partition_id", F.spark_partition_id()
    )
    orphan.write.parquet(f"{out}/spans/run_id=orphan")
    committed = read_committed_spans(spark, out)
    assert committed.count() == 40  # orphans excluded
    assert committed.select("doc_id").distinct().count() == 40


def test_kill_and_resume_recovers_crashed_docs(spark, docs, tmp_path):
    """Kill-and-resume: a run crashes AFTER writing span files but
    BEFORE the lineage commit. Those docs are invisible, and the next
    resume must re-extract exactly them (the anti-join only skips
    lineage-committed docs, not orphaned ones)."""
    out = str(tmp_path / "ckpt")
    survivors = docs.filter(F.xxhash64("doc_id") % 2 == 0)
    crashed = docs.filter(F.xxhash64("doc_id") % 2 != 0)
    run_extract_with_checkpoint(spark, survivors, out, run_id="r1",
                                num_partitions=4)
    # the crashed attempt got as far as its span write (step 2 of the
    # commit protocol) — no lineage row ever lands
    (extract_spans(crashed, num_partitions=4)
     .withColumn("partition_id", F.spark_partition_id())
     .write.parquet(f"{out}/spans/run_id=crashed"))
    assert read_committed_spans(spark, out).count() == survivors.count()

    r = run_extract_with_checkpoint(spark, docs, out, run_id="r2",
                                    num_partitions=4)
    assert r["docs_done"] == crashed.count()  # exactly the crashed docs
    committed = read_committed_spans(spark, out)
    assert committed.count() == 40
    direct = extract_spans(docs, num_partitions=4)
    joined = committed.alias("a").join(direct.alias("b"), "doc_id")
    assert joined.filter(F.col("a.spans") != F.col("b.spans")).count() == 0


def test_metrics_account_for_all_docs(spark, docs, tmp_path):
    out = str(tmp_path / "ckpt")
    summary = run_extract_with_checkpoint(spark, docs, out, run_id="r1",
                                          num_partitions=4)
    metrics = read_metrics(spark, out)
    agg = metrics.agg(F.sum("doc_count").alias("d"),
                      F.sum("span_count").alias("s")).collect()[0]
    assert agg["d"] == 40 == summary["docs_done"]
    direct_spans = (
        extract_spans(docs, num_partitions=4)
        .agg(F.sum(F.size("spans"))).collect()[0][0]
    )
    assert agg["s"] == direct_spans == summary["spans_done"]
    assert metrics.filter(F.col("text_bytes") <= 0).count() == 0


def test_compact_checkpoint_tables(spark, docs, tmp_path):
    """Many append-y runs leave many small lineage/metrics files; the
    bin-packing pass rewrites them to few files without changing what
    readers see."""
    import os

    from stirling_pdf_spark.runtime.checkpoint import (
        compact_checkpoint_tables,
        read_metrics,
    )

    out = str(tmp_path / "ckpt")
    num = F.regexp_extract("doc_id", "([0-9]+)", 1).cast("long")
    for i in range(4):  # 4 runs of 10 docs -> 4 file batches per table
        run_extract_with_checkpoint(spark, docs.filter(num % 4 == i), out,
                                    run_id=f"r{i}", num_partitions=4)
    before_rows = read_committed_spans(spark, out).count()
    before_metric_rows = read_metrics(spark, out).count()
    n_files = lambda p: sum(  # noqa: E731
        f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs)
    lineage_files_before = n_files(f"{out}/lineage")
    assert lineage_files_before > 1

    stats = compact_checkpoint_tables(spark, out)
    assert stats["lineage"]["files_after"] == 1  # tiny table bin-packs to 1
    assert n_files(f"{out}/lineage") == 1 < lineage_files_before
    # reader-visible content unchanged
    assert read_committed_spans(spark, out).count() == before_rows == 40
    assert read_metrics(spark, out).count() == before_metric_rows
    # idempotent: already compact -> no-op
    again = compact_checkpoint_tables(spark, out)
    assert again["lineage"]["files_before"] == again["lineage"]["files_after"]


def test_expire_orphan_runs(spark, docs, tmp_path):
    from stirling_pdf_spark.runtime.checkpoint import expire_orphan_runs

    out = str(tmp_path / "ckpt")
    run_extract_with_checkpoint(spark, docs, out, run_id="good",
                                num_partitions=4)
    orphan = extract_spans(docs.limit(2), num_partitions=2).withColumn(
        "partition_id", F.spark_partition_id())
    orphan.write.parquet(f"{out}/spans/run_id=crashed")
    removed = expire_orphan_runs(spark, out)
    assert removed == ["crashed"]
    assert read_committed_spans(spark, out).count() == 40
    # committed data untouched, second GC is a no-op
    assert expire_orphan_runs(spark, out) == []
