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
