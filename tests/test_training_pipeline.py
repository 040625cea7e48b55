"""Composed training build (serialize.build_training_corpus): stage
order and survivor sets pinned on a crafted corpus where every stage
drops someone — quality rejects the stopword-free doc, dedup collapses
the copies, the split holds out by content hash, packing spans the
rest."""

from __future__ import annotations

from pyspark.sql import functions as F

from stirling_pdf_spark.operators.serialize import (
    build_training_corpus, hash_split)

_GOOD = ("the data and the model that we have built with care "
         * 6).strip()  # 60 words, 2+ stopwords


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_order_and_survivors(spark):
    rows = [
        (0, _GOOD),                       # survives (if in train slice)
        (1, _GOOD),                       # exact copy -> dedup drops
        (2, "short doc"),                 # quality: word count < 50
        (3, " ".join(f"w{i}" for i in range(60))),  # no stopwords
        (4, _GOOD + " extra trailing words here now"),  # distinct, keeps
    ]
    df = _df(spark, rows)
    out = build_training_corpus(df, seq_len=16).collect()
    survivors = sorted({r["doc_id"] for r in out})
    # quality removed 2 and 3; dedup removed 1 (copy of 0); the split
    # keeps whichever of 0/4 hash into the 98% train slice
    train_ids = {
        r["doc_id"]
        for r in hash_split(_df(spark, [rows[0], rows[4]])).collect()
        if r["split"] == "train"}
    assert survivors == sorted(train_ids)
    assert 1 not in survivors and 2 not in survivors and 3 not in survivors
    # packing conserves tokens per surviving doc
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_in_seq"]
        assert r["n_tokens"] == len(dict(rows)[r["doc_id"]].split())
    for did, tot in per_doc.items():
        assert tot == len(dict(rows)[did].split())


def test_dedup_keeps_lowest_id(spark):
    df = _df(spark, [(7, _GOOD), (3, _GOOD), (9, _GOOD)])
    out = {r["doc_id"] for r in build_training_corpus(df, seq_len=16)
           .collect()}
    assert out in ({3}, set())  # empty only if _GOOD hashes to holdout
    split = {r["doc_id"]: r["split"]
             for r in hash_split(_df(spark, [(3, _GOOD)])).collect()}
    assert (out == {3}) == (split[3] == "train")
