"""ExactSubstr-style coverage (operators/dedup.substring_dup_coverage):
crafted repeats pin the dup criterion (global shingle freq >= 2,
cross-doc AND self-repeat), the fixed-interval union fold, and the
short-doc / unique-doc edges."""

from __future__ import annotations

from stirling_pdf_spark.operators.dedup import substring_dup_coverage


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, w=3):
    out = substring_dup_coverage(_df(spark, rows), w=w).collect()
    return {r["doc_id"]: (r["n_tokens"], r["dup_starts"],
                          r["dup_cov"], r["keep"]) for r in out}


def test_cross_doc_exact_copy_fully_covered(spark):
    text = "a b c d e f"
    got = _run(spark, [(0, text), (1, text)], w=3)
    # every position 0..3 is dup; union covers all 6 tokens
    assert got[0] == (6, 4, 6, 0)
    assert got[1] == (6, 4, 6, 0)


def test_partial_overlap_union(spark):
    # docs share only the run 'x y z w' (positions 2..3 resp. 0..1
    # give shingles 'x y z' and 'y z w'); doc 0's tail differs
    got = _run(spark, [(0, "p q x y z w t1 t2"),
                       (1, "x y z w u v")], w=3)
    # doc 0: dup positions 2,3 -> union = min(3, 1) + 3 = 4 tokens
    assert got[0] == (8, 2, 4, 0)       # 4*2 == 8, not < 8 -> keep=0
    assert got[1] == (6, 2, 4, 0)       # 4*2 >= 6


def test_self_repeat_counts_as_dup(spark):
    # 'a b c' occurs twice INSIDE one doc (positions 0 and 5)
    got = _run(spark, [(0, "a b c q r a b c")], w=3)
    assert got[0][1] == 2               # both occurrences are starts
    assert got[0][2] == 6               # two disjoint 3-token spans


def test_unique_and_short_docs(spark):
    got = _run(spark, [(0, "m n o p"), (1, "zz yy"),
                       (2, "completely different words here")], w=3)
    assert got[0] == (4, 0, 0, 1)
    assert got[1] == (2, 0, 0, 1)       # shorter than w: no shingles
    assert got[2] == (4, 0, 0, 1)


def test_gapped_intervals_do_not_merge(spark):
    # dup runs at both ends, unique middle
    a = "a b c MID1 MID2 MID3 x y z"
    b = "a b c OTHER x y z"
    got = _run(spark, [(0, a), (1, b)], w=3)
    # doc 0: dup positions 0 and 6 -> 3 + 3 tokens
    assert got[0] == (9, 2, 6, 0)
    assert got[1] == (7, 2, 6, 0)
