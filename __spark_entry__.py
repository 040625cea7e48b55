"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction aggregate on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline operators (dedup /
similarity / text analysis / multimodal), each verified against an
independent DuckDB SQL derivation at sf0.01.

The extract_* queries run the REAL distributed pipeline (corpus
derivation -> salted Arrow-UDF extraction -> reassembly) and are
checked against a closed-form arithmetic oracle — see
stirling_pdf_spark/plans/oracles.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stirling_pdf_spark.plans import oracles as O  # noqa: E741
from stirling_pdf_spark.corpus.spark_synth import (
    docs_from_documents_table,
    synth_docs_df,
)
from stirling_pdf_spark.operators import relational as R
from stirling_pdf_spark.operators import dedup as D
from stirling_pdf_spark.operators import similarity as S
from stirling_pdf_spark.operators import textstats as TS
from stirling_pdf_spark.operators.extract_pipeline import (
    explode_spans,
    extract_spans,
)
from stirling_pdf_spark.operators.multimodal import text_payload_metadata
from stirling_pdf_spark.sources.tables import read_table


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable inside the driver's Python workers
    (the spark-submit --py-files shape) — idempotent."""
    try:
        from stirling_pdf_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added, or driver-side sys.path suffices


# ------------------------------------------------------------- extraction

def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship_package(spark)
    return extract_spans(docs_from_documents_table(spark, sf_dir))


def q_extract_text_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = explode_spans(_extracted(spark, sf_dir)).filter(F.col("kind") == "text")
    w = Window.partitionBy("doc_id").orderBy("order")
    return flat.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("text_rank"),
        "text",
    )


def q_extract_attachments(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = explode_spans(_extracted(spark, sf_dir))
    return flat.filter(F.col("kind") == "attachment").select(
        "doc_id", F.col("text").alias("name"), "media_ref"
    )


def q_extract_span_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = explode_spans(_extracted(spark, sf_dir))
    return flat.groupBy("doc_id", "kind").agg(F.count("*").alias("n_spans"))


def q_extract_synth_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: archetype corpus (two-column layouts, mixed
    media, HTML, mega-docs through the salted path) -> kind totals."""
    _ship_package(spark)
    docs = synth_docs_df(spark, 96, seed=42, mega_pages=(120, 160))
    flat = explode_spans(extract_spans(docs, salt_threshold=2000))
    return flat.groupBy("kind").agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ---------------------------------------------------------- training ops

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(read_table(spark, sf_dir, "documents"))


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        read_table(spark, sf_dir, "documents"),
        n=O.NGRAM_N, threshold_pct=O.JACCARD_THRESHOLD_PCT,
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        read_table(spark, sf_dir, "documents"),
        n=O.NGRAM_N, num_hashes=O.MINHASH_K, bands=O.MINHASH_BANDS,
        threshold_pct=O.JACCARD_THRESHOLD_PCT,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_groups(
        read_table(spark, sf_dir, "documents"), bits=O.SIMHASH_BITS
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_dup_pairs(
        read_table(spark, sf_dir, "embeddings"), threshold=O.EMB_DUP_THRESHOLD
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_topk(
        read_table(spark, sf_dir, "embeddings"), O.ANN_QUERY_IDS, k=O.ANN_K
    )


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_buckets(read_table(spark, sf_dir, "embeddings"), O.LSH_PLANES)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_topk(
        read_table(spark, sf_dir, "embeddings"), O.ANN_QUERY_IDS,
        O.LSH_PLANES, k=O.ANN_K,
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.lang_id(read_table(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.quality_stats(read_table(spark, sf_dir, "documents"))


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.token_counts(read_table(spark, sf_dir, "documents"))


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TS.fingerprint(read_table(spark, sf_dir, "documents"))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_payload_metadata(read_table(spark, sf_dir, "documents"))


# ----------------------------------------------------------------- driver

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract ordered spans for every document in the
    sf0.001 corpus and aggregate span counts per (doc, kind)."""
    return q_extract_span_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # extraction core (north rule)
        "extract_text_spans": q_extract_text_spans,
        "extract_attachments": q_extract_attachments,
        "extract_span_counts": q_extract_span_counts,
        "extract_synth_corpus": q_extract_synth_corpus,  # rows-only
        # relational analogues (SURVEY.md §2)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q5_nation_volume": R.q5_nation_volume,
        "e16_customer_profile": R.e16_customer_profile,
        "e18_top_order_per_customer": R.e18_top_order_per_customer,
        "s3_running_sum_buckets": R.s3_running_sum_buckets,
        "s4_lead_next_order": R.s4_lead_next_order,
        "e12_unique_name_suffix": R.e12_unique_name_suffix,
        "s6_reverse_permutation": R.s6_reverse_permutation,
        "s1_merge_comparator": R.s1_merge_comparator,
        "f1_filter_contains_text": R.f1_filter_contains_text,
        "f3_filter_count_comparator": R.f3_filter_count_comparator,
        "f5_filter_size_comparator": R.f5_filter_size_comparator,
        "f7_page_select_dsl": R.f7_page_select_dsl,
        "e13_regex_search": R.e13_regex_search,
        "e3_doc_classification": R.e3_doc_classification,
        "events_hourly_rollup": R.events_hourly_rollup,
        "events_json_extract": R.events_json_extract,
        # training-data pipeline
        "dedup_exact_groups": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_simhash_groups": q_dedup_simhash,
        "dedup_embedding_pairs": q_dedup_embedding,
        "ann_cosine_topk": q_ann_topk,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_lsh_topk": q_ann_lsh_topk,  # rows-only (approximate recall)
        "text_lang_id": q_text_lang_id,
        "text_quality": q_text_quality,
        "text_token_counts": q_text_token_counts,
        "text_fingerprint": q_text_fingerprint,
        "multimodal_meta": q_multimodal_meta,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_text_spans": O.EXTRACT_TEXT_SPANS,
        "extract_attachments": O.EXTRACT_ATTACHMENTS,
        "extract_span_counts": O.EXTRACT_SPAN_COUNTS,
        "q1_pricing_summary": O.Q1_PRICING_SUMMARY,
        "q3_shipping_priority": O.Q3_SHIPPING_PRIORITY,
        "q5_nation_volume": O.Q5_NATION_VOLUME,
        "e16_customer_profile": O.E16_CUSTOMER_PROFILE,
        "e18_top_order_per_customer": O.E18_TOP_ORDER_PER_CUSTOMER,
        "s3_running_sum_buckets": O.S3_RUNNING_SUM_BUCKETS,
        "s4_lead_next_order": O.S4_LEAD_NEXT_ORDER,
        "e12_unique_name_suffix": O.E12_UNIQUE_NAME_SUFFIX,
        "s6_reverse_permutation": O.S6_REVERSE_PERMUTATION,
        "s1_merge_comparator": O.S1_MERGE_COMPARATOR,
        "f1_filter_contains_text": O.F1_FILTER_CONTAINS_TEXT,
        "f3_filter_count_comparator": O.F3_FILTER_COUNT_COMPARATOR,
        "f5_filter_size_comparator": O.F5_FILTER_SIZE_COMPARATOR,
        "f7_page_select_dsl": O.F7_PAGE_SELECT_DSL,
        "e13_regex_search": O.E13_REGEX_SEARCH,
        "e3_doc_classification": O.E3_DOC_CLASSIFICATION,
        "events_hourly_rollup": O.EVENTS_HOURLY_ROLLUP,
        "events_json_extract": O.EVENTS_JSON_EXTRACT,
        "dedup_exact_groups": O.DEDUP_EXACT_GROUPS,
        "dedup_ngram_jaccard": O.DEDUP_NGRAM_JACCARD,
        "dedup_minhash_lsh": O.DEDUP_MINHASH_LSH,
        "dedup_simhash_groups": O.DEDUP_SIMHASH_GROUPS,
        "dedup_embedding_pairs": O.DEDUP_EMBEDDING_PAIRS,
        "ann_cosine_topk": O.ANN_COSINE_TOPK,
        "ann_lsh_buckets": O.ANN_LSH_BUCKETS,
        "text_lang_id": O.TEXT_LANG_ID,
        "text_quality": O.TEXT_QUALITY,
        "text_token_counts": O.TEXT_TOKEN_COUNTS,
        "text_fingerprint": O.TEXT_FINGERPRINT,
        "multimodal_meta": O.MULTIMODAL_META,
    }
