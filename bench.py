"""Per-round benchmark. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline = wall seconds for the full suite; the extraction stage also
reports documents/sec (the north-rule metric). Corpus for extraction =
deterministic synthetic interleaved docs (seed 42) including mega-docs
through the salted path, plus the sf-dir-derived corpus.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32),
     BENCH_N_DOCS      (default 3000) synthetic corpus size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "3000"))

# headline queries re-run at bench scale (names from __spark_entry__)
BENCH_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_volume",
    "e18_top_order_per_customer",
    "s3_running_sum_buckets",
    "events_hourly_rollup",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash_groups",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_quality",
    "text_lang_id",
    "multimodal_meta",
    # round-2 additions: new operator families
    "e14_stream_table",
    "e17_full_info",
    "e18_title_inference",
    "f6_filter_rotation",
)


def main() -> None:
    import __spark_entry__ as E
    from stirling_pdf_spark.corpus.spark_synth import synth_docs_df
    from stirling_pdf_spark.operators.extract_pipeline import extract_spans
    from stirling_pdf_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    # --- extraction headline (north rule): synthetic corpus incl. mega-docs,
    # materialized first so the two-branch pipeline scans parquet (the real
    # deployment shape) instead of re-running synthesis per branch
    corpus_path = f"/tmp/bench_docs_{N_DOCS}.parquet"
    t0 = time.time()
    synth_docs_df(spark, N_DOCS, seed=42, mega_pages=(300, 400)) \
        .write.mode("overwrite").parquet(corpus_path)
    timings["synth_corpus"] = round(time.time() - t0, 3)
    docs = spark.read.parquet(corpus_path)

    t0 = time.time()
    n_out = extract_spans(docs, salt_threshold=4000).count()
    extract_s = time.time() - t0
    timings["extract_synth"] = round(extract_s, 3)
    docs_per_sec = round(N_DOCS / extract_s, 1)

    from stirling_pdf_spark.corpus.spark_synth import docs_from_documents_table

    t0 = time.time()
    n_sf = extract_spans(docs_from_documents_table(spark, SF_DIR)).count()
    timings["extract_sf_corpus"] = round(time.time() - t0, 3)

    # --- headline relational / training queries at the bench sf
    from stirling_pdf_spark.runtime.staging import release_staged

    qs = E.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        release_staged()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction": {
            "n_docs_synth": N_DOCS,
            "n_docs_out": n_out,
            "n_docs_sf_corpus": n_sf,
            "docs_per_sec_synth": docs_per_sec,
            "cores": CPUS,
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
