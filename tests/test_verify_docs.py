"""operators/verify.py — wire-compliance audit rule semantics."""

from __future__ import annotations


def _docs(spark, spans):
    return spark.createDataFrame([("d1", spans)],
                                 "doc_id string, spans array<struct<"
                                 "kind string, text string,"
                                 " media_ref string, offset int>>")


def _one(spark, spans):
    from stirling_pdf_spark.operators.verify import verify_docs

    return verify_docs(_docs(spark, spans)).collect()[0]


WIRE = "1|72.0|72.0|11.0|Helvetica\thello world"


def test_clean_doc_compliant(spark):
    r = _one(spark, [("text", WIRE, "", 0),
                     ("media", "1|0.0|0.0|9.0|9.0", "media-abc", 1),
                     ("attachment", "a.dat", "media-def", 2)])
    assert r["compliant"] and r["total_failures"] == 0
    assert r["failed_rules"] == ""


def test_empty_doc_compliant(spark):
    assert _one(spark, [])["compliant"]


def test_offset_gap_and_duplicate(spark):
    r = _one(spark, [("text", WIRE, "", 0), ("text", WIRE, "", 2)])
    assert r["failed_rules"] == "order-dense"
    r = _one(spark, [("text", WIRE, "", 1), ("text", WIRE, "", 1)])
    assert r["failed_rules"] == "order-dense"


def test_unknown_kind_and_bad_wire(spark):
    r = _one(spark, [("wibble", "x", "", 0)])
    assert r["failed_rules"] == "kind-known"
    r = _one(spark, [("text", "no tab here", "", 0)])
    assert r["failed_rules"] == "text-wire"
    # page 0 is invalid (pages are 1-based)
    r = _one(spark, [("text", "0|1.0|1.0|1.0|F\tx", "", 0)])
    assert r["failed_rules"] == "text-wire"


def test_missing_media_ref(spark):
    r = _one(spark, [("media", "1|0.0|0.0|9.0|9.0", "", 0)])
    assert r["failed_rules"] == "media-ref"


def test_multiple_failures_sorted(spark):
    r = _one(spark, [("wibble", "x", "", 0),
                     ("text", "junk", "", 0)])
    assert r["failed_rules"] == "kind-known order-dense text-wire"
    assert r["total_failures"] == 3 and not r["compliant"]
