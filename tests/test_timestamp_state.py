"""/timestamp-pdf state semantics (TimestampController.java).

The driver gate pins the five-TSA round trip at sf0.01; these tests
pin the allowlist rejection (the controller's pre-flight URL check)
and the DocTimeStamp dictionary shape."""

from __future__ import annotations

import pytest


def test_unknown_tsa_url_rejected(spark):
    from stirling_pdf_spark.operators.pageops import add_doc_timestamp
    from stirling_pdf_spark.sources.tables import DOCS_SCHEMA

    docs = spark.createDataFrame([{"doc_id": "d", "spans": []}],
                                 DOCS_SCHEMA)
    with pytest.raises(ValueError, match="allowlist"):
        add_doc_timestamp(docs, "http://evil.example.com/tsa", "2026-01-01")


def test_doc_timestamp_dictionary_shape(spark):
    from stirling_pdf_spark.operators.pageops import add_doc_timestamp
    from stirling_pdf_spark.sources.tables import DOCS_SCHEMA

    docs = spark.createDataFrame([{"doc_id": "d", "spans": []}],
                                 DOCS_SCHEMA)
    out = add_doc_timestamp(
        docs, "https://freetsa.org/tsr", "2026-03-04")
    spans = out.collect()[0]["spans"]
    texts = [s["text"] for s in spans]
    assert "sig0|signature|" in texts
    assert ("sig_0|TSA:FreeTSA|2026-03-04|https://freetsa.org/tsr|"
            "|ETSI.RFC3161|true") in texts
