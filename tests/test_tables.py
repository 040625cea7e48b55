"""E14 lattice table extraction."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stirling_pdf_spark.corpus.spark_synth import synth_docs_df
from stirling_pdf_spark.kernel.extract import extract_doc
from stirling_pdf_spark.kernel.model import TextRun
from stirling_pdf_spark.kernel.tables import (
    Rule,
    encode_rule,
    extract_table_csv,
)
from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.operators.extract_pipeline import extract_spans


def test_lattice_csv_golden():
    rules = [Rule(1, 0.0, 0.0, 200.0, 0.0), Rule(1, 0.0, 20.0, 200.0, 20.0),
             Rule(1, 0.0, 40.0, 200.0, 40.0),
             Rule(1, 0.0, 0.0, 0.0, 40.0), Rule(1, 100.0, 0.0, 100.0, 40.0),
             Rule(1, 200.0, 0.0, 200.0, 40.0)]
    runs = [
        TextRun(1, 5.0, 5.0, 9.0, "F", "a1"),
        TextRun(1, 105.0, 5.0, 9.0, "F", "b1"),
        TextRun(1, 5.0, 25.0, 9.0, "F", 'say "hi"'),
        # two runs in one cell join in (y, x) order
        TextRun(1, 150.0, 25.0, 9.0, "F", "more"),
        TextRun(1, 105.0, 25.0, 9.0, "F", "b2"),
    ]
    csv = extract_table_csv(rules, runs)
    assert csv == '"a1","b1"\n"say ""hi""","b2 more"'


def test_no_lattice_without_two_rules():
    assert extract_table_csv([Rule(1, 0, 0, 10, 0)], []) is None
    assert extract_table_csv(
        [Rule(1, 0, 0, 10, 0), Rule(1, 0, 5, 10, 5)], []) is None  # no verticals


def test_kernel_emits_table_span_after_page_text():
    spans = [
        ("text", wire.encode_text_run(TextRun(1, 72.0, 72.0, 11.0, "F", "body")), "", 0),
        ("rule", encode_rule(Rule(1, 300.0, 200.0, 500.0, 200.0)), "", 1),
        ("rule", encode_rule(Rule(1, 300.0, 220.0, 500.0, 220.0)), "", 2),
        ("rule", encode_rule(Rule(1, 300.0, 200.0, 300.0, 220.0)), "", 3),
        ("rule", encode_rule(Rule(1, 500.0, 200.0, 500.0, 220.0)), "", 4),
        ("text", wire.encode_text_run(TextRun(1, 305.0, 205.0, 9.0, "F", "cell")), "", 5),
    ]
    out = extract_doc(spans)
    kinds = [s.kind for s in out]
    assert kinds == ["text", "text", "table"]
    assert out[2].text == '"cell"'
    # the cell run also appears as a text line (stripper + lattice both
    # see it, like the reference's separate endpoints)
    assert out[1].text == "cell"


def test_tables_through_spark_pipeline(spark):
    docs = synth_docs_df(spark, 120, seed=42, mega_pages=(10, 15),
                         num_partitions=4)
    out = extract_spans(docs, num_partitions=4)
    tables = out.select(F.explode("spans").alias("s")) \
        .filter(F.col("s.kind") == "table")
    rows = tables.collect()
    assert rows, "mixed-media archetype must produce lattice tables"
    for r in rows:
        csv = r["s"]["text"]
        lines = csv.split("\n")
        assert len(lines) == 2 and all(len(l.split('","')) == 3 for l in lines)
