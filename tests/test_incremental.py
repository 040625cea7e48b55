"""runtime/incremental.extract_incremental — churn-proportional
refresh semantics: unchanged docs carry over, changed/new re-extract,
deleted docs drop, and the stitched output equals a full re-run."""

from __future__ import annotations

from pyspark.sql import functions as F

from stirling_pdf_spark.corpus.spark_synth import synth_docs_df
from stirling_pdf_spark.operators.extract_pipeline import extract_spans
from stirling_pdf_spark.runtime.incremental import extract_incremental


def _canon(df):
    return sorted(
        (r["doc_id"],
         tuple((s["kind"], s["text"], s["media_ref"], s["order"])
               for s in r["spans"]))
        for r in df.collect())


def test_incremental_matches_full_rerun(spark):
    base = synth_docs_df(spark, 20, num_partitions=4)
    ids = sorted(r["doc_id"] for r in base.select("doc_id").collect())
    dropped, changed = ids[3], ids[5:10]
    base_out = extract_spans(base)
    # revised snapshot: drop one doc, mutate five others' first span
    kept = base.filter(F.col("doc_id") != dropped)
    rev = kept.withColumn(
        "spans",
        F.when(
            F.col("doc_id").isin(changed),
            F.expr("transform(spans, (s, i) -> if(i = 0,"
                   " named_struct('kind', s.kind, 'text',"
                   " concat(s.text, ' mutated'), 'media_ref',"
                   " s.media_ref, 'offset', s.offset), s))"),
        ).otherwise(F.col("spans")))

    out = extract_incremental(base, base_out, rev)
    flags = {r["doc_id"]: r["reused"]
             for r in out.select("doc_id", "reused").collect()}
    assert dropped not in flags                # deletion drops
    assert all(flags[d] is False for d in changed)
    assert sum(1 for v in flags.values() if not v) == 5
    assert all(flags[d] for d in ids if d != dropped and d not in changed)

    full = extract_spans(rev)
    assert _canon(out.drop("reused")) == _canon(full)


def test_incremental_new_doc_is_fresh(spark):
    base = synth_docs_df(spark, 4, num_partitions=2)
    rev = synth_docs_df(spark, 5, num_partitions=2)  # one extra doc
    new_id = (set(r["doc_id"] for r in rev.select("doc_id").collect())
              - set(r["doc_id"] for r in base.select("doc_id").collect()))
    out = extract_incremental(base, extract_spans(base), rev)
    flags = {r["doc_id"]: r["reused"]
             for r in out.select("doc_id", "reused").collect()}
    assert len(new_id) == 1 and flags[new_id.pop()] is False
    assert sum(1 for v in flags.values() if v) == 4
