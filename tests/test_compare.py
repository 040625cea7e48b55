"""Compare-tool parity: kernel/diff.py vs a direct port of the
reference's textDiff.ts (per-cell DP + identical backtrack), plus the
buildWordChanges grouping semantics and the Spark operator shapes."""

from __future__ import annotations

import random

from stirling_pdf_spark.kernel.diff import (
    change_groups,
    diff_summary,
    diff_words,
    pane_tokens,
    tokenize,
)


def _reference_diff(a: list[str], b: list[str]) -> list[tuple[str, str]]:
    """Literal port of textDiff.ts:21-56 (buildLcsMatrix + diffWords)
    — the per-cell O(n*m) loop the kernel's vectorized fill must
    reproduce exactly, including the added-vs-removed tie-break."""
    rows, cols = len(a) + 1, len(b) + 1
    m = [[0] * cols for _ in range(rows)]
    for i in range(1, rows):
        for j in range(1, cols):
            m[i][j] = (m[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                       else max(m[i][j - 1], m[i - 1][j]))
    out: list[tuple[str, str]] = []
    i, j = len(a), len(b)
    while i > 0 or j > 0:
        if i > 0 and j > 0 and a[i - 1] == b[j - 1]:
            out.insert(0, ("unchanged", a[i - 1]))
            i -= 1
            j -= 1
        elif j > 0 and (i == 0 or m[i][j] == m[i][j - 1]):
            out.insert(0, ("added", b[j - 1]))
            j -= 1
        elif i > 0:
            out.insert(0, ("removed", a[i - 1]))
            i -= 1
    return out


def test_tokenize_matches_reference():
    assert tokenize("  a  b\t\nc ") == ["a", "b", "c"]
    assert tokenize("") == []
    assert tokenize("   ") == []


def test_diff_words_matches_reference_port_random():
    rng = random.Random(7)
    vocab = ["the", "a", "x", "y", "z", "cat", "dog", "ran"]
    for _ in range(200):
        a = [rng.choice(vocab) for _ in range(rng.randrange(0, 14))]
        b = list(a)
        for _ in range(rng.randrange(0, 5)):
            op = rng.randrange(3)
            if op == 0 and b:
                b.pop(rng.randrange(len(b)))
            elif op == 1:
                b.insert(rng.randrange(len(b) + 1), rng.choice(vocab))
            elif b:
                b[rng.randrange(len(b))] = rng.choice(vocab)
        assert diff_words(a, b) == _reference_diff(a, b)


def test_diff_words_substitution_order():
    # isolated substitution emits removed-then-added (textDiff.ts:47
    # prefers 'added' at matrix ties, which the backtrack order turns
    # into removed-first in document order)
    assert diff_words(["p", "x", "q"], ["p", "y", "q"]) == [
        ("unchanged", "p"), ("removed", "x"), ("added", "y"),
        ("unchanged", "q")]


def test_diff_summary_multiset_stable():
    # equal-token ambiguity: whichever copy the backtrack attributes,
    # the sorted per-type joins are fixed
    u, nr, na, rem, add = diff_summary(
        ["a", "x", "x", "b"], ["a", "x", "b"])
    assert (u, nr, na, rem, add) == (3, 1, 0, "x", "")


def test_diff_summary_affix_trim_matches_untrimmed_port():
    # diff_summary trims the common prefix AND suffix before the DP;
    # counts and sorted per-type joins must equal the untrimmed
    # reference port's on adversarial repeated-token inputs (where the
    # backtrack may cross the trim boundary and attribute a different
    # COPY of an equal token — the multisets must not move)
    def port_summary(a, b):
        diff = _reference_diff(a, b)
        u = sum(1 for t, _ in diff if t == "unchanged")
        rem = sorted(x for t, x in diff if t == "removed")
        add = sorted(x for t, x in diff if t == "added")
        return (u, len(rem), len(add), " ".join(rem), " ".join(add))

    cases = [
        (["x", "y", "x"], ["x"]),              # cross-boundary match
        (["x"], ["x", "y", "x"]),
        (["v", "v"], ["v", "w", "v", "w"]),
        (["p", "x", "y"], ["p", "y", "x"]),    # ambiguous middle LCS
        (["a"] * 6, ["a"] * 3),
        ([], ["a", "b"]),
        (["a", "b"], []),
        (["s", "s", "t", "s"], ["s", "t", "s", "s"]),
    ]
    rng = random.Random(13)
    vocab = ["x", "y", "z"]                    # tiny vocab: many ties
    for _ in range(300):
        a = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
        b = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
        cases.append((a, b))
    for a, b in cases:
        assert diff_summary(a, b) == port_summary(a, b), (a, b)


def test_pane_tokens_and_groups():
    diff = diff_words(["t0", "t1", "t2", "t3"], ["t0", "A", "B", "t3"])
    assert pane_tokens(diff, "base") == [
        ("t0", False), ("t1", True), ("t2", True), ("t3", False)]
    assert change_groups(diff, "base") == [
        ("base-group-t1-t2", 1, 2, "t1 t2", 2)]
    assert change_groups(diff, "comparison") == [
        ("comparison-group-t1-t2", 1, 2, "A B", 2)]


def test_change_groups_punctuation_label_trim():
    diff = diff_words(["w"], [",", "w"])
    groups = change_groups(diff, "comparison")
    # label is the plain space-join, trimmed (buildWordChanges)
    assert groups == [("comparison-group-t0-t0", 0, 0, ",", 1)]
    assert change_groups(diff, "base") == []


def test_max_tokens_caps_matrix():
    a = [f"a{i}" for i in range(100)]
    b = [f"b{i}" for i in range(100)]
    d = diff_words(a, b, max_tokens=10)
    assert len(d) == 20 and all(t != "unchanged" for t, _ in d)


def test_compare_summary_spark(spark):
    from stirling_pdf_spark.operators.compare import (
        compare_changes,
        compare_summary,
    )

    base = spark.createDataFrame(
        [("d1", "alpha beta gamma"), ("d2", "one two")],
        ["doc_id", "text"])
    rev = spark.createDataFrame(
        [("d1", "alpha BETA gamma"), ("d2", "one two three")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in compare_summary(base, rev).collect()}
    assert rows["d1"]["n_removed"] == 1 and rows["d1"]["n_added"] == 1
    assert rows["d1"]["removed_sorted"] == "beta"
    assert rows["d2"]["n_added"] == 1 and rows["d2"]["added_sorted"] == "three"

    ch = {(r["doc_id"], r["pane"]): r
          for r in compare_changes(base, rev).collect()}
    assert ch[("d1", "base")]["group_id"] == "base-group-t1-t1"
    assert ch[("d2", "comparison")]["label"] == "three"


def test_rrf_fusion_spark(spark):
    from stirling_pdf_spark.operators.retrieval import rrf_fusion

    docs = spark.createDataFrame(
        [(i, "hash join window agg batch slow scan filter")
         for i in range(8)], ["doc_id", "text"])
    emb = spark.createDataFrame(
        [(i, [float(i % 3 + 1), float((i * 7) % 5 + 1)], 0)
         for i in range(64)], ["vec_id", "embedding", "label"])
    out = rrf_fusion(docs, emb, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_no"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        scores = [r["rrf_x1e9"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
    # a doc surfaced by both lists sums two contributions
    assert any(r["n_lists"] == 2 for r in out) or all(
        r["n_lists"] == 1 for r in out)
