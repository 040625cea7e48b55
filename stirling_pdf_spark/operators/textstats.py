"""Text-analysis operators: language ID, quality scoring, token
counting, fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — no
Python UDFs. Outputs are integers/strings only, so the DuckDB-oracle
value hash is exact (no float rounding games).

The reference's analogue surface: per-page char counts and text
presence thresholds (GetInfoOnPDF.java:812-851,
PdfContentExtractor.java:52,70-86), filename sanitization and text
normalization utilities; these operators extend that to corpus-level
training-data hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import parallelize, words_col

# small deterministic stopword sets; order of LANGS is the tie-break
# precedence for lang_id (first wins on equal score)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "von", "zu", "den", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"),
}
LANGS = tuple(LANG_STOPWORDS)

# BPE-ish token classes: letter runs, digit runs, single other glyphs
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_hits(lang: str, words: str = "w"):
    vals = ", ".join(f"'{s}'" for s in LANG_STOPWORDS[lang])
    return F.expr(
        f"size(filter({words}, x -> array_contains(array({vals}), x)))"
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, pred_lang, score) — argmax of per-language stopword hit
    counts over whitespace tokens; 'und' when no stopword hits at all.
    Ties resolved by LANGS order via a strict-> comparison chain."""
    base = parallelize(df).select(F.col(id_col).alias("id"),
                     words_col(text_col).alias("w"))
    scored = base.select(
        "id", *[_stopword_hits(lang).alias(f"s_{lang}") for lang in LANGS]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANGS:
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scored.select(
        "id", pred.alias("pred_lang"), best.cast("long").alias("score")
    )


def quality_stats(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Integer quality metrics per doc:
       n_chars, n_words, n_distinct_words, mean_word_len_x100 (integer
       division), punct_count, quality (0-3 bucket).
    Quality buckets: +1 for >= 20 words, +1 for distinct ratio >= 50%,
    +1 for mean word length in [300, 900] x100."""
    t = F.col(text_col)
    base = parallelize(df).select(
        F.col(id_col).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        words_col(text_col).alias("w"),
        F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("long").alias("punct_count"),
        F.length(F.regexp_replace(t, r"\s", "")).cast("long").alias("n_nonspace"),
    )
    stats = base.select(
        "id", "n_chars", "punct_count",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct_words"),
        "n_nonspace",
    ).withColumn(
        "mean_word_len_x100",
        F.when(F.col("n_words") > 0,
               F.floor(F.col("n_nonspace") * 100 / F.col("n_words")).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    quality = (
        F.when(F.col("n_words") >= 20, 1).otherwise(0)
        + F.when(F.col("n_distinct_words") * 2 >= F.col("n_words"), 1).otherwise(0)
        + F.when(F.col("mean_word_len_x100").between(300, 900), 1).otherwise(0)
    ).cast("long")
    return stats.select(
        "id", "n_chars", "n_words", "n_distinct_words",
        "mean_word_len_x100", "punct_count", quality.alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_regex_tokens) — whitespace tokens and
    BPE-ish regex tokens (letter runs / digit runs / single symbols)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(words_col(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .cast("long").alias("n_regex_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, fp) — order-insensitive document fingerprint: md5 of the
    sorted distinct word set. Robust to word reordering; the shingle
    fingerprint variant (rolling hash over n-grams) is
    dedup.minhash_signature_cols."""
    sorted_words = F.array_sort(F.array_distinct(words_col(text_col)))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.array_join(sorted_words, " ")).alias("fp"),
    )
