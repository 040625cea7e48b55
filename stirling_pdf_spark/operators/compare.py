"""Document compare — Spark plumbing over the kernel/diff.py LCS.

The reference's compare tool (frontend/editor/src/core/components/
tools/compare/) extracts each file's text, word-diffs the two token
streams (utils/textDiff.ts) and renders per-pane change groups for
highlight + navigation (hooks/useCompareHighlights.ts).  Here the two
sides are two CORPORA (base vs revised snapshot) and the diff runs
per doc_id pair — the corpus-refresh audit a training pipeline runs
when a re-crawl or re-extraction lands: what changed, where, how
much.

Scale shape: one equi-join on doc_id (both sides hash-partition on
the key; no broadcast needed — the sides are the same size), then a
map-only Arrow-batched diff.  Per-pair cost is O(len_a · len_b) in
DOCUMENT length only; pairs are independent so the stage parallelizes
perfectly and a doc-length salt is unnecessary — one mega-document
costs one task its matrix, bounded by ``max_tokens``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = ("doc_id string, n_unchanged long, n_removed long, "
                   "n_added long, removed_sorted string, added_sorted string")
_GROUPS_SCHEMA = ("doc_id string, pane string, group_idx long, "
                  "group_id string, first_pos long, last_pos long, "
                  "label string, n_tokens long")


def _paired(base: DataFrame, revised: DataFrame) -> DataFrame:
    b = base.select(F.col("doc_id"), F.col("text").alias("base_text"))
    r = revised.select(F.col("doc_id"), F.col("text").alias("rev_text"))
    # pin the diff stage's parallelism: the joined pair rows are a few
    # KB each, so AQE's byte-based coalescing folds the join output to
    # 1-2 partitions — but the downstream LCS matrix is O(len_a*len_b)
    # per row, compute far above bytes. Hash on doc_id (deterministic);
    # the repartition is the only exchange the map stage needs.
    par = base.sparkSession.sparkContext.defaultParallelism
    return b.join(r, "doc_id").repartition(par, "doc_id")


def compare_summary(base: DataFrame, revised: DataFrame,
                    max_tokens: int | None = None) -> DataFrame:
    """Per-doc diff rollup between two (doc_id, text) corpora:
    (doc_id, n_unchanged, n_removed, n_added, removed_sorted,
    added_sorted) — counts from the reference LCS diff, the
    removed/added token lists sorted so the row is a pure function of
    the per-type multisets (deterministic under equal-token ties)."""
    from ..kernel.diff import diff_summary, tokenize

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, bt, rt in zip(pdf["doc_id"], pdf["base_text"],
                                   pdf["rev_text"]):
                u, nr, na, rem, add = diff_summary(
                    tokenize(bt or ""), tokenize(rt or ""),
                    max_tokens=max_tokens)
                rows.append((did, u, nr, na, rem, add))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_unchanged", "n_removed", "n_added",
                "removed_sorted", "added_sorted"])

    return _paired(base, revised).mapInPandas(gen, _SUMMARY_SCHEMA)


def compare_changes(base: DataFrame, revised: DataFrame,
                    max_tokens: int | None = None) -> DataFrame:
    """Per-pane change-navigation rows between two corpora — the
    buildWordChanges parity surface: maximal runs of highlighted
    tokens in each pane's own token stream, with the reference's
    ``{pane}-group-t{first}-t{last}`` ids and space-joined labels.

    Output: (doc_id, pane, group_idx, group_id, first_pos, last_pos,
    label, n_tokens), pane in {base, comparison}, group_idx 0-based
    per (doc, pane) in document order."""
    from ..kernel.diff import change_groups, diff_words, tokenize

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, bt, rt in zip(pdf["doc_id"], pdf["base_text"],
                                   pdf["rev_text"]):
                diff = diff_words(tokenize(bt or ""), tokenize(rt or ""),
                                  max_tokens=max_tokens)
                for pane in ("base", "comparison"):
                    for idx, (gid, first, last, label, n) in enumerate(
                            change_groups(diff, pane)):
                        rows.append((did, pane, idx, gid, first, last,
                                     label, n))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "pane", "group_idx", "group_id", "first_pos",
                "last_pos", "label", "n_tokens"])

    return _paired(base, revised).mapInPandas(gen, _GROUPS_SCHEMA)
