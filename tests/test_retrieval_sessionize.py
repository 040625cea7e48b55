"""BM25 retrieval + gap sessionization edge semantics.

The driver gates pin both against DuckDB oracles at sf0.01; these
tests pin hand-computed scores, the exact gap boundary, and parity
with Spark's built-in session_window (the structured-streaming
operator whose batch semantics events_sessionize reproduces)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_bm25_hand_computed(spark):
    from stirling_pdf_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [(0, "a b a"), (1, "a c"), (2, "b b b c")], ["doc_id", "text"])
    out = [(r["rank"], r["doc_id"], r["score_x1e6"])
           for r in bm25_topk(df, queries=(("q", ("a", "b")),), k=10)
           .orderBy("rank").collect()]
    # N=3 tot=9 avgdl_x100=300; df(a)=df(b)=2 -> idf_x1000=600
    # d0: a tf2 norm100 -> 600*1375; b tf1 -> 600*1000 = 1,425,000
    # d2: b tf3 norm125 -> 600*1466 = 879,600
    # d1: a tf1 norm75  -> 600*1157 = 694,200
    assert out == [(1, 0, 1425000), (2, 2, 879600), (3, 1, 694200)]


def test_bm25_score_ties_break_by_doc_id(spark):
    from stirling_pdf_spark.operators.retrieval import bm25_topk

    # identical docs -> identical scores -> doc_id asc order
    df = spark.createDataFrame(
        [(5, "a b"), (3, "a b"), (9, "c d")], ["doc_id", "text"])
    out = [(r["rank"], r["doc_id"])
           for r in bm25_topk(df, queries=(("q", ("a",)),), k=10)
           .orderBy("rank").collect()]
    assert out == [(1, 3), (2, 5)]          # doc 9 has no query term


def _write_events(spark, tmp_path, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [(i, base + datetime.timedelta(seconds=s), u, "t", v, "{}")
            for i, (s, u, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_sessionize_gap_boundary(spark, tmp_path):
    from stirling_pdf_spark.operators.relational import events_sessionize

    gap = 10  # minutes
    sf = _write_events(spark, tmp_path, [
        (0, 1, 1.0),
        (599, 1, 1.0),        # diff < gap: same session
        (1199, 1, 1.0),       # diff == gap exactly: NEW session
                              # (session_window's end-exclusive rule)
        (0, 2, 2.0),          # second user independent
    ])
    out = {(r["user_id"], r["session_idx"]): r["n_events"]
           for r in events_sessionize(spark, sf, gap_minutes=gap).collect()}
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_sessionize_matches_builtin_session_window(spark):
    """events_sessionize == F.session_window on the sf0.001 events
    table: same session count per user, same (start, end, n) multiset.
    session_window is the streaming-native operator; the batch
    operator must agree with it for the streaming story to hold."""
    from stirling_pdf_spark.operators.relational import events_sessionize
    from stirling_pdf_spark.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    gap = 480
    ours = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"])
            for r in events_sessionize(spark, sf, gap_minutes=gap).collect()}
    ev = read_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    builtin = {
        (r["user_id"], r["start_us"], r["end_us"], r["n"])
        for r in ev.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{gap} minutes").alias("w"))
        .agg(F.min(us).alias("start_us"), F.max(us).alias("end_us"),
             F.count("*").alias("n"))
        .collect()
    }
    assert ours == builtin and len(ours) > 0


def test_phrase_search_counts_positions_and_overlaps(spark):
    from stirling_pdf_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a table table table b"),       # overlapping 2x 'table table'
            (2, "fast sort then fast sort"),    # 2x 'fast sort'
            (3, "scan slow fast scan slow"),    # 1x 3-gram, partial tail
            (4, "nothing here"),
        ],
        "doc_id long, text string")
    got = {(r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
           for r in phrase_search(docs).collect()}
    assert got == {
        ("p0", 1): (2, 1),
        ("p1", 2): (2, 0),
        ("p2", 3): (1, 0),
    }


def test_phrase_search_custom_single_term_phrase(spark):
    from stirling_pdf_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(1, "x y x"), (2, "y y")], "doc_id long, text string")
    got = {(r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
           for r in phrase_search(docs, phrases=(("q", ("x",)),)).collect()}
    assert got == {("q", 1): (2, 0)}


def test_bm25_hard_negatives_excludes_gold_and_ranks_dense(spark):
    from stirling_pdf_spark.operators.retrieval import bm25_hard_negatives

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma filler filler"),
            (1, "alpha beta gamma"),          # strongest non-gold match
            (2, "alpha beta other words here"),
            (3, "alpha only once in text"),
            (4, "nothing shared at all"),
        ],
        "doc_id long, text string")
    got = bm25_hard_negatives(docs, every=5, n_terms=3, k=3).collect()
    rows = {(r["query_doc_id"], r["rank"]): r["neg_doc_id"] for r in got}
    # only doc 0 queries; gold (0) excluded; doc 4 shares no term
    assert set(r["query_doc_id"] for r in got) == {0}
    assert 0 not in set(r["neg_doc_id"] for r in got)
    assert rows[(0, 1)] == 1          # full 3-term overlap ranks first
    assert sorted(rows.values()) == [1, 2, 3]
    ranks = sorted(r["rank"] for r in got)
    assert ranks == [1, 2, 3]         # dense after exclusion


def test_bm25_hard_negatives_duplicate_query_terms_weigh_double(spark):
    from stirling_pdf_spark.operators.retrieval import (
        _bm25_scored, bm25_hard_negatives,
    )

    docs = spark.createDataFrame(
        [
            (0, "rare rare boring"),   # query: rare rare boring
            (1, "rare filler filler"),
            (2, "boring filler filler"),
        ],
        "doc_id long, text string")
    got = {r["neg_doc_id"]: r["score_x1e6"]
           for r in bm25_hard_negatives(docs, every=3, n_terms=3,
                                        k=3).collect()}
    # 'rare' appears twice in the query: doc 1's contribution is the
    # single-term score doubled; df(rare) == df(boring) == 2 so the
    # per-occurrence contribution is symmetric with doc 2's
    assert got[1] == 2 * got[2]


def test_events_hourly_anomaly_spike_and_cold_start(spark):
    import datetime as dt

    from stirling_pdf_spark.operators.relational import (
        events_hourly_anomaly,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 14 calm hours of 2 events, then a 10-event spike
    for h in range(14):
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=eid % 50),
                         1, "click", 1.0, "{}"))
            eid += 1
    for _ in range(10):
        rows.append((eid, base + dt.timedelta(hours=14, minutes=eid % 50),
                     1, "click", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    got = {r["hour_epoch"]: r for r in
           events_hourly_anomaly(df, min_trail=12).collect()}
    spike_epoch = int((base + dt.timedelta(hours=14)).timestamp())
    assert got[spike_epoch]["anomaly"] == 1
    assert got[spike_epoch]["cnt"] == 10
    # every calm hour and every cold-start hour stays unflagged
    assert sum(r["anomaly"] for r in got.values()) == 1
    # hour 0 has no trail at all
    first_epoch = int(base.timestamp())
    assert got[first_epoch]["trail_n"] == 0


def test_shuffle_order_reproducible_and_seed_sensitive(spark):
    from stirling_pdf_spark.operators.serialize import shuffle_order

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = {(r["id"]): (r["shard"], r["pos"])
         for r in shuffle_order(df, seed="epoch0").collect()}
    b = {(r["id"]): (r["shard"], r["pos"])
         for r in shuffle_order(df, seed="epoch0").collect()}
    c = {(r["id"]): (r["shard"], r["pos"])
         for r in shuffle_order(df, seed="epoch1").collect()}
    assert a == b            # reproducible
    assert a != c            # a new seed reshuffles
    # positions are dense 0..n-1 within every shard
    from collections import defaultdict
    by_shard = defaultdict(list)
    for shard, pos in a.values():
        by_shard[shard].append(pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_events_rollup_levels_are_consistent(spark):
    import datetime as dt

    from stirling_pdf_spark.operators.relational import events_rollup

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i % 3), 1,
             "click" if i % 2 else "view", 1.5, "{}")
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    got = events_rollup(df).collect()
    leaves = [r for r in got if r["lvl"] == 0]
    subs = {r["event_type"]: r for r in got if r["lvl"] == 1}
    [total] = [r for r in got if r["lvl"] == 2]
    assert total["event_type"] == "(all)" and total["hod"] == -1
    assert total["n_events"] == 12
    assert total["sum_value_micro"] == 12 * 1_500_000
    # per-type subtotals equal the sum of their leaves
    for et in ("click", "view"):
        mine = [r for r in leaves if r["event_type"] == et]
        assert subs[et]["n_events"] == sum(r["n_events"] for r in mine)
        assert subs[et]["hod"] == -1
    assert sum(r["n_events"] for r in leaves) == 12
