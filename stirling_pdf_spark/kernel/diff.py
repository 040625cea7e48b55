"""Word-level document diff — the compare tool's text algorithm.

Parity target: the reference's compare tool diffs the two documents'
extracted text word-by-word with an LCS matrix and groups the changed
words per pane for highlight/navigation
(frontend/editor/src/core/utils/textDiff.ts:12-56 tokenize/diffWords,
frontend/editor/src/core/components/tools/compare/hooks/
useCompareHighlights.ts:28-69 buildWordChanges).

This module is the pure (token-list in, diff out) kernel; the Spark
plumbing (per-doc-pair fan-out, extraction read-back) lives in
operators/compare.py.  The DP fill is vectorized with numpy (one
O(m) row op per of n rows — no per-cell Python), the backtrack is the
O(n+m) walk with the reference's exact tie-breaking: on a mismatch,
"added" wins whenever m[i][j] == m[i][j-1] (textDiff.ts:47), else
"removed".

Cost is O(n·m) per document pair — quadratic in DOCUMENT length,
never in corpus size, and each pair is independent, so the operator
is embarrassingly parallel; ``max_tokens`` caps the matrix for
adversarial mega-documents (the same practical bound the in-browser
reference implies by running the diff on interactively-sized files).
"""

from __future__ import annotations

import re

import numpy as np

_WS = re.compile(r"\s+")

UNCHANGED = "unchanged"
REMOVED = "removed"
ADDED = "added"


def tokenize(text: str) -> list[str]:
    """textDiff.ts:12 — split on whitespace runs, drop empties."""
    return [t for t in _WS.split(text or "") if t]


def _common_suffix_len(a: list[str], b: list[str], lim: int) -> int:
    """Length of the common tail of a and b, capped at ``lim``."""
    n, m = len(a), len(b)
    k = 0
    while k < lim and a[n - 1 - k] == b[m - 1 - k]:
        k += 1
    return k


def _diff_core(a: list[str], b: list[str]) -> list[tuple[str, str]]:
    """The untrimmed LCS DP + reference backtrack (textDiff.ts:21-56)."""
    n, m = len(a), len(b)
    # DP fill: row[j] = max(diag + 1 if eq else up[j], row[j - 1]) —
    # the running-max form of the textDiff matrix (identical values:
    # on a match diag+1 dominates both neighbors, else max(left, up))
    mat = np.zeros((n + 1, m + 1), dtype=np.int32)
    if n and m:
        b_arr = np.array(b, dtype=object)
        for i in range(1, n + 1):
            up = mat[i - 1]
            t = np.where(b_arr == a[i - 1], up[:m] + 1, up[1:])
            mat[i, 1:] = np.maximum.accumulate(t)
    out: list[tuple[str, str]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and a[i - 1] == b[j - 1]:
            out.append((UNCHANGED, a[i - 1]))
            i -= 1
            j -= 1
        elif j > 0 and (i == 0 or mat[i, j] == mat[i, j - 1]):
            out.append((ADDED, b[j - 1]))
            j -= 1
        elif i > 0:
            out.append((REMOVED, a[i - 1]))
            i -= 1
    out.reverse()
    return out


def diff_words(a: list[str], b: list[str],
               max_tokens: int | None = None) -> list[tuple[str, str]]:
    """textDiff.ts:21-56 — LCS word diff, reference tie-breaking.

    Returns the interleaved token list as (type, text) with type in
    {unchanged, removed, added}, in the reference's emission order
    (backtrack from (n, m), unshift).

    Common-SUFFIX trimming before the DP is an exact identity, not an
    approximation: the backtrack takes the diagonal through any equal
    tail unconditionally (the token-equality branch fires before the
    matrix tests), and mat[i][j] depends only on a[:i]/b[:j], so the
    walk over the remaining region is bit-identical to the walk over
    the trimmed inputs. diff(a, b) == diff(a[:n-k], b[:m-k]) +
    unchanged-tail — pinned against the untrimmed port in tests. For
    corpus-refresh diffs (small edits in long documents) this turns the
    O(n*m) matrix into O(changed-window^2).
    """
    if max_tokens is not None:
        a, b = a[:max_tokens], b[:max_tokens]
    k = _common_suffix_len(a, b, min(len(a), len(b)))
    out = _diff_core(a[:len(a) - k], b[:len(b) - k])
    if k:
        out.extend((UNCHANGED, t) for t in a[len(a) - k:])
    return out


def pane_tokens(diff: list[tuple[str, str]],
                pane: str) -> list[tuple[str, bool]]:
    """Project the interleaved diff onto one pane's token stream.

    base pane = the original document's tokens in order (removed ones
    highlighted); comparison pane = the revised document's tokens
    (added ones highlighted) — the two token streams the reference
    renders side by side.
    """
    keep_change = REMOVED if pane == "base" else ADDED
    skip = ADDED if pane == "base" else REMOVED
    return [(text, typ == keep_change)
            for typ, text in diff if typ != skip]


def change_groups(diff: list[tuple[str, str]],
                  pane: str) -> list[tuple[str, int, int, str, int]]:
    """useCompareHighlights.ts:28-69 buildWordChanges — maximal runs
    of consecutive highlighted tokens in the pane's own stream.

    Returns (group_id, first_pos, last_pos, label, n_tokens) in
    document order; group_id mirrors the reference's
    ``{pane}-group-t{first}-t{last}`` metaIndex naming, label is the
    plain space-join of the run (trimmed), and runs whose label trims
    to empty are dropped exactly like the reference's flushRun.
    """
    prefix = f"{pane}-group"
    groups: list[tuple[str, int, int, str, int]] = []
    run: list[tuple[int, str]] = []

    def flush() -> None:
        if not run:
            return
        label = " ".join(text for _, text in run).strip()
        if label:
            first, last = run[0][0], run[-1][0]
            groups.append((f"{prefix}-t{first}-t{last}", first, last,
                           label, len(run)))
        run.clear()

    for pos, (text, highlighted) in enumerate(pane_tokens(diff, pane)):
        if highlighted:
            run.append((pos, text))
        else:
            flush()
    flush()
    return groups


def diff_summary(a: list[str], b: list[str],
                 max_tokens: int | None = None
                 ) -> tuple[int, int, int, str, str]:
    """Per-pair rollup: (n_unchanged, n_removed, n_added,
    removed_sorted_join, added_sorted_join).

    The removed/added joins are SORTED so the value is a function of
    the per-type token multisets alone, while the interleaved order at
    equal-token ties is an implementation detail.

    Because only the multisets (not the interleaving) survive into the
    output, the common PREFIX can be trimmed too (on top of
    diff_words' sequence-exact suffix trim): with a = P+a', b = P+b',
    the backtrack's matched-token multiset equals multiset(P) + the
    trimmed walk's matches. Sketch: mat[|P|+i][|P|+j] = |P| +
    mat'[i][j] (the LCS common-prefix lemma), so middle-region
    decisions coincide with the trimmed walk's; at the region boundary
    the matrix test can never fire on the b side (mat[i][p] = p >
    p-1 = mat[i][p-1] there), so the walk either mirrors the trimmed
    removed/added chain or takes a cross-boundary token match, and in
    the cross case the remaining boundary walk must realize
    mat[i-1][p-1] = p-1 matches — the rest of the prefix matches
    fully, and the matched multiset still totals multiset(P) + M'.
    Counts and per-type multisets are therefore invariant (pinned
    against the untrimmed port in tests); the interleaving is not,
    which is why diff_words itself only trims the suffix.
    """
    if max_tokens is not None:
        a, b = a[:max_tokens], b[:max_tokens]
    lim = min(len(a), len(b))
    p = 0
    while p < lim and a[p] == b[p]:
        p += 1
    k = _common_suffix_len(a, b, lim - p)
    diff = _diff_core(a[p:len(a) - k], b[p:len(b) - k])
    unchanged = p + k + sum(1 for t, _ in diff if t == UNCHANGED)
    removed = sorted(x for t, x in diff if t == REMOVED)
    added = sorted(x for t, x in diff if t == ADDED)
    return (unchanged, len(removed), len(added),
            " ".join(removed), " ".join(added))
