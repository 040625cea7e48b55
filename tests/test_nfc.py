"""Unicode NFC normalization (operators/textstats.nfc_normalize):
real canonical composition through the Arrow stage (inputs are
written as explicit NFD escape sequences), char-count deltas, ASCII
invariance and null passthrough."""

from __future__ import annotations

from stirling_pdf_spark.operators.textstats import nfc_normalize


def test_composition_and_ascii_invariance(spark):
    rows = [
        (0, "café au lait"),                 # e + combining acute
        (1, "plain ascii text"),
        (2, "Ångström unit"),          # ring + diaeresis
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars_src"], r["text_nfc"])
           for r in nfc_normalize(df).collect()}
    assert got[0] == (13, "caf\u00e9 au lait")
    assert len(got[0][1]) == 12                    # one char composed away
    assert got[1] == (16, "plain ascii text")
    assert got[2] == (15, "\u00c5ngstr\u00f6m unit")
    assert len(got[2][1]) == 13


def test_null_passthrough(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "über")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars_src"], r["text_nfc"])
           for r in nfc_normalize(df).collect()}
    assert got[0] == (None, None)
    assert got[1] == (5, "\u00fcber")
