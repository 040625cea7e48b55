"""Tests for the lang-ID confusion matrix and the equal-byte shard
plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from stirling_pdf_spark.operators.packing import shard_plan
from stirling_pdf_spark.operators.textstats import lang_confusion


def test_lang_confusion_cells(spark):
    rows = [
        (0, "the and of to a in", "en"),      # predicted en, true en
        (1, "the and of to a in", "de"),      # predicted en, true de
        (2, "xyzzy qwerty", "en"),            # no stopwords -> und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string,"
                               " lang string")
    out = {(r["true_lang"], r["pred_lang"]): r
           for r in lang_confusion(df).collect()}
    assert out[("en", "en")]["n_docs"] == 1
    assert out[("en", "en")]["n_match"] == 1
    assert out[("de", "en")]["n_docs"] == 1
    assert out[("de", "en")]["n_match"] == 0
    assert out[("en", "und")]["n_docs"] == 1
    assert out[("en", "und")]["n_match"] == 0


def test_shard_plan_closed_form(spark):
    # 10 docs x 100 bytes, target 250: offsets 0..900 -> shards
    # 0,0,0(off 200),1(250? off 300//250=1)... compute: shard =
    # (i*100) // 250 -> [0,0,0,1,1,2,2,2,3,3]
    rows = [(i, "x" * 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["shard_id"]: r
           for r in shard_plan(df, target_bytes=250).collect()}
    assert [out[s]["n_docs"] for s in sorted(out)] == [3, 2, 3, 2]
    assert out[0]["min_doc"] == 0 and out[0]["max_doc"] == 2
    assert out[3]["min_doc"] == 8 and out[3]["max_doc"] == 9
    assert sum(r["sum_bytes"] for r in out.values()) == 1000


def test_shard_plan_parallelism_invariant(spark):
    rows = [(i, "b" * (37 + (i * 13) % 91)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plans = []
    for nr in (1, 4, 16):
        out = shard_plan(df.repartition(nr), target_bytes=1000,
                         num_ranges=nr)
        plans.append(sorted(tuple(r) for r in out.collect()))
    assert plans[0] == plans[1] == plans[2]


def test_shard_plan_multibyte_utf8(spark):
    # é is 2 UTF-8 bytes: 5 chars = 10 bytes per doc
    rows = [(i, "ééééé") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = shard_plan(df, target_bytes=20).collect()
    assert sum(r["sum_bytes"] for r in out) == 40
    assert {r["shard_id"] for r in out} == {0, 1}
