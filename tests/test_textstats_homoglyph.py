"""Confusable-skeleton normalization (textstats.homoglyph_skeleton)."""

from stirling_pdf_spark.operators.textstats import homoglyph_skeleton


def test_homoglyph_skeleton(spark):
    rows = [
        ("d1", "visit pаypal now"),          # Cyrillic а
        ("d2", "visit paypal now"),               # clean Latin
        ("d3", "Ρѕ mixed іtem"),   # Greek Ρ + Cyrillic ѕ/і
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.id: (r.n_confusables, r.skeleton, r.is_spoof)
           for r in homoglyph_skeleton(df).collect()}
    assert got["d1"] == (1, "visit paypal now", True)
    assert got["d2"] == (0, "visit paypal now", False)
    assert got["d3"][0] == 3
    assert got["d3"][1] == "Ps mixed item"
    assert got["d3"][2] is True


def test_domain_prefix_boilerplate(spark):
    from stirling_pdf_spark.operators.textstats import (
        domain_prefix_boilerplate,
    )
    rows = [
        ("a.com", "TPL|alpha body"),
        ("a.com", "TPL|zeta body"),
        ("a.com", "TPL|mid body"),
        ("b.org", "solo document"),
        ("c.net", ""),
        ("c.net", "x"),
    ]
    df = spark.createDataFrame(rows, ["domain", "text"])
    got = {r.domain: (r.n_docs, r.prefix_len, r.prefix)
           for r in domain_prefix_boilerplate(df).collect()}
    assert got["a.com"] == (3, 4, "TPL|")
    # single doc: prefix is the (capped) doc itself
    assert got["b.org"] == (1, 13, "solo document")
    # empty-string extreme: LCP 0, no sequence error
    assert got["c.net"] == (2, 0, "")


def test_domain_prefix_cap(spark):
    from stirling_pdf_spark.operators.textstats import (
        domain_prefix_boilerplate,
    )
    long = "q" * 200
    df = spark.createDataFrame([("d", long), ("d", long)],
                               ["domain", "text"])
    (r,) = domain_prefix_boilerplate(df, cap=64).collect()
    assert (r.prefix_len, r.prefix) == (64, "q" * 64)


def test_lm_trigram_backoff_seen_backoff_and_unseen_paths(spark):
    from stirling_pdf_spark.operators.textstats import lm_trigram_backoff

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),        # train: trigrams 'a b c','b c d'
            (2, "a b c"),          # train: reinforces 'a b c'
            (1, "a b c x"),        # score: 'a b c' seen, 'b c x' backoff
            (3, "q r s t"),        # score: nothing seen, no backoff
            (5, "zz"),             # score: too short -> zeros
        ],
        "doc_id long, text string")
    got = {r["id"]: r for r in lm_trigram_backoff(docs).collect()}
    r1 = got[1]
    # seen: c3('a b c')=2, c2('a b')=2 -> 1000; backoff for 'b c x':
    # c2('c x')=0 -> cb null -> s=0 but counted neither seen nor
    # backoff; 'b c x' has b23='c x' unseen -> s=0
    assert (r1["n_trigrams"], r1["n_seen"], r1["n_backoff"]) == (2, 1, 0)
    assert r1["fit_x1000"] == (1000 + 0) // 2
    r3 = got[3]
    assert (r3["n_seen"], r3["n_backoff"], r3["fit_x1000"]) == (0, 0, 0)
    r5 = got[5]
    assert (r5["n_trigrams"], r5["fit_x1000"]) == (0, 0)


def test_lm_trigram_backoff_backoff_value_alpha(spark):
    from stirling_pdf_spark.operators.textstats import lm_trigram_backoff

    docs = spark.createDataFrame(
        [
            (0, "m n o"),          # train: bigrams 'm n','n o'
            (1, "x m n o"),        # 'x m n': unseen, b23='m n' cb=1,
                                   # c1('m')=1 -> (4*1000)//10 = 400
                                   # 'm n o': seen -> 1000
        ],
        "doc_id long, text string")
    got = {r["id"]: r for r in lm_trigram_backoff(docs).collect()}
    r = got[1]
    assert (r["n_trigrams"], r["n_seen"], r["n_backoff"]) == (2, 1, 1)
    assert r["fit_x1000"] == (400 + 1000) // 2


def test_quality_ensemble_vote_majority_rule(spark):
    from stirling_pdf_spark.operators.textstats import (
        quality_ensemble_vote,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % 9}" for j in range(i, i + 6 + i % 7)))
         for i in range(12)],
        "doc_id long, text string")
    got = {r["id"]: r for r in quality_ensemble_vote(docs).collect()}
    assert len(got) == 12
    for r in got.values():
        assert r["votes"] == r["label"] + r["head"] + r["len_head"]
        assert r["keep"] == (1 if r["votes"] >= 2 else 0)
    # the ensemble must actually split the corpus
    assert {r["keep"] for r in got.values()} == {0, 1}


def test_ngram_novelty_closed_form(spark):
    from stirling_pdf_spark.operators.textstats import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles: 'a b c','b c d'
            (2, "a b c"),          # shingle 'a b c' shared with doc 1
            (3, "x y z q"),        # fully unique
            (4, "zz"),             # < 3 tokens -> zeros
        ],
        "doc_id long, text string")
    got = {r["id"]: r for r in ngram_novelty(docs).collect()}
    assert (got[1]["n_shingles"], got[1]["n_unique"]) == (2, 1)
    assert got[1]["novelty_x1000"] == 500
    assert (got[2]["n_shingles"], got[2]["n_unique"]) == (1, 0)
    assert got[3]["novelty_x1000"] == 1000
    assert (got[4]["n_shingles"], got[4]["novelty_x1000"]) == (0, 0)
