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
