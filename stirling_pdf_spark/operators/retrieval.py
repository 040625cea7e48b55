"""BM25 retrieval over the documents table.

The training-data-pipeline retrieval stage (dense retrieval's sparse
sibling; used for decontamination lookups, quality-by-query probes and
RAG corpus audits — public Okapi BM25, Robertson & Walker 1994; the
reference has no retrieval surface, this extends the engine the way
SURVEY.md's training-pipeline section calls for).

Integer-exact scoring so Spark and DuckDB agree bit-for-bit (the repo
discipline — no floats anywhere): k1 = 1.2 and b = 0.75 are carried
as x10/x100 integers, every division is a floor div on positives, and
the logarithmic IDF is replaced by the monotone rational surrogate
idf_x1000 = (1000 * (2*(N - df) + 1)) div (2*df + 1) — same ranking
structure (rare terms weigh more, tf saturates at k1, length
normalization by b), deterministic across engines.

Scale shape: the query list is a literal broadcast; term statistics
(df) are vocabulary-sized and broadcast; the postings aggregation is
one (id, term) partial-agg'd groupBy; the final top-k windows
partition BY QUERY over candidate docs only (docs sharing at least
one query term) — for web-scale corpora with broad queries, swap the
window for a per-partition heap + merge, which this plan's
partitioning already permits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import parallelize, words_col

# (query_id, terms) — vocabulary terms of the synthetic documents table
BM25_QUERIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("q0", ("hash", "join")),
    ("q1", ("window", "agg", "batch")),
    ("q2", ("slow", "scan", "filter")),
)

K1_X10 = 12   # Okapi k1 = 1.2
B_X100 = 75   # Okapi b = 0.75


def bm25_topk(df: DataFrame,
              queries: tuple[tuple[str, tuple[str, ...]], ...] = BM25_QUERIES,
              k: int = 10,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(query_id, rank, doc_id, score_x1e6): the top-k docs per query
    by integer-exact Okapi BM25 (rational IDF), rank ties broken by
    doc_id asc. Docs with no query term never enter the ranking; N
    and avgdl count every doc with at least one token."""
    toks = (
        parallelize(df)
        .select(F.col(id_col).cast("long").alias("id"),
                F.explode(words_col(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("tot")
    ).select("n_docs", F.expr("(100 * tot) div n_docs").alias("avgdl_x100"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))

    q = df.sparkSession.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        ["query_id", "term"])

    joined = (
        F.broadcast(q)
        .join(tf, "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn("norm_x100",
                    F.lit(100 - B_X100)
                    + F.expr(f"({B_X100} * 100 * dl) div avgdl_x100"))
        .withColumn("denom_x1000",
                    1000 * F.col("tf") + K1_X10 * F.col("norm_x100"))
        .withColumn("ratio_x1000",
                    F.expr(f"(1000 * (1000 + 100 * {K1_X10}) * tf) "
                           "div denom_x1000"))
        .withColumn("idf_x1000",
                    F.expr("(1000 * (2 * (n_docs - df) + 1)) "
                           "div (2 * df + 1)"))
    )
    scored = joined.groupBy("query_id", "id").agg(
        F.sum(F.col("idf_x1000") * F.col("ratio_x1000"))
        .cast("long").alias("score_x1e6"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_x1e6"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("id").alias("doc_id"),
                "score_x1e6")
    )
