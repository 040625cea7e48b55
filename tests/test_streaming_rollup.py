"""Watermark finalization semantics of the streaming hourly rollup.

The driver gate pins output == batch rollup; this test pins the
MECHANISM: append mode must hold back windows the watermark has not
passed (run 1), and a restarted run must recover state from the
checkpoint and flush them once a later event advances the watermark
(run 2). If the operator ever leaked unfinalized windows, run 1
would emit all three hours and the partial-count assertion fails."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="roll_test_")
    yield f"{base}/in", f"{base}/out", f"{base}/cp"
    shutil.rmtree(base, ignore_errors=True)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")


def test_append_mode_holds_unfinalized_windows(spark, dirs):
    from stirling_pdf_spark.streaming.rollup import stream_hourly_rollup

    in_dir, out_dir, cp = dirs
    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, hours, typ="click", v=1.5):
        return (i, t0 + datetime.timedelta(hours=hours), 1, typ, v, "{}")

    # hours 0, 1 and 2: with a 1 h watermark driven to max - 1h = h1,
    # only the hour-0 window (end 01:00 <= watermark) may emit
    _events(spark, [ev(0, 0.2), ev(1, 0.4), ev(2, 1.5), ev(3, 2.0)]) \
        .write.mode("append").parquet(in_dir)
    stream_hourly_rollup(spark, in_dir, out_dir, cp).awaitTermination()
    first = spark.read.parquet(out_dir).collect()
    assert {r["hour_epoch"] for r in first} <= {
        int(t0.timestamp())}, "unfinalized windows leaked in run 1"

    # sentinel 3 h past max -> restart flushes hours 1 and 2
    _events(spark, [ev(9, 5.0, typ="sentinel", v=0.0)]) \
        .write.mode("append").parquet(in_dir)
    stream_hourly_rollup(spark, in_dir, out_dir, cp).awaitTermination()
    rows = {r["hour_epoch"]: (r["event_type"], r["n_events"],
                              r["sum_value_micro"])
            for r in spark.read.parquet(out_dir).collect()
            if r["event_type"] != "sentinel"}
    h = 3600
    assert rows == {
        int(t0.timestamp()): ("click", 2, 3000000),
        int(t0.timestamp()) + h: ("click", 1, 1500000),
        int(t0.timestamp()) + 2 * h: ("click", 1, 1500000),
    }
    # every window emitted exactly once across both runs
    all_rows = [r for r in spark.read.parquet(out_dir).collect()
                if r["event_type"] != "sentinel"]
    assert len(all_rows) == 3


def test_streaming_dedup_replay_and_restart(spark, tmp_path):
    """First arrival wins; in-run duplicates AND a full replay after
    checkpoint restart are all dropped by the recovered state."""
    import datetime

    from stirling_pdf_spark.streaming.dedupe import stream_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base + datetime.timedelta(minutes=i), i % 3,
             f"t{i % 2}", float(i) / 7.0, "{}") for i in range(40)]
    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    ev = spark.createDataFrame(rows, schema)
    ev.write.mode("append").parquet(in_dir)
    ev.filter("event_id % 5 = 0").write.mode("append").parquet(in_dir)
    stream_dedup(spark, in_dir, out_dir, cp).awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 40  # in-run dups dropped
    # full replay + restart: recovered state drops every row
    ev.write.mode("append").parquet(in_dir)
    stream_dedup(spark, in_dir, out_dir, cp).awaitTermination()
    out = spark.read.parquet(out_dir)
    assert out.count() == 40
    got = {r["event_id"]: r for r in out.collect()}
    assert sorted(got) == list(range(40))
    # integer-exact columns
    r7 = got[7]
    assert r7["value_micro"] == 1000000
    assert r7["ts_us"] % 60_000_000 == 0  # whole-minute fixture ts
