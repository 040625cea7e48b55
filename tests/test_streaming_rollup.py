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


def test_audio_downsample_floor_means_and_partial_block_drop(spark):
    from stirling_pdf_spark.kernel import wav
    from stirling_pdf_spark.operators.multimodal import audio_downsample

    # mono, 10 frames, factor 4 -> 2 blocks, 2 trailing frames dropped
    samples = [7, -3, 5, 1, -8, -8, -8, -8, 99, 99]
    payload = wav.encode_pcm16(1, 8000, samples)
    media = spark.createDataFrame(
        [("m0", "wav", payload), ("bad", "wav", b"RIFFxxxx")],
        "media_ref string, fmt string, payload binary")
    got = {r["media_ref"]: r for r in audio_downsample(
        media, factor=4).collect()}
    m = got["m0"]
    # block means: (7-3+5+1)//4 = 2; (-32)//4 = -8
    assert (m["n_out_frames"], m["rate_out"]) == (2, 2000)
    assert m["peak_out"] == 8
    assert m["sumabs_out"] == 2 + 8
    assert m["energy_out"] == 4 + 64
    b = got["bad"]
    assert b["reason"] is not None and b["n_out_frames"] is None


def test_audio_downsample_negative_sum_uses_floor_division(spark):
    from stirling_pdf_spark.kernel import wav
    from stirling_pdf_spark.operators.multimodal import audio_downsample

    # sum = -2 over 4 frames: floor(-0.5) = -1 (NOT trunc's 0)
    payload = wav.encode_pcm16(1, 8000, [1, -1, 1, -3])
    media = spark.createDataFrame(
        [("m", "wav", payload)],
        "media_ref string, fmt string, payload binary")
    r = audio_downsample(media, factor=4).collect()[0]
    assert (r["sumabs_out"], r["energy_out"]) == (1, 1)


def test_audio_downsample_stereo_per_channel_blocks(spark):
    from stirling_pdf_spark.kernel import wav
    from stirling_pdf_spark.operators.multimodal import audio_downsample

    # stereo 4 frames: L = 4,4,4,4 -> 4; R = -8,-8,-8,-8 -> -8
    inter = [4, -8, 4, -8, 4, -8, 4, -8]
    payload = wav.encode_pcm16(2, 16000, inter)
    media = spark.createDataFrame(
        [("m", "wav", payload)],
        "media_ref string, fmt string, payload binary")
    r = audio_downsample(media, factor=4).collect()[0]
    assert (r["channels"], r["n_out_frames"]) == (2, 1)
    assert r["peak_out"] == 8
    assert r["sumabs_out"] == 12
    assert r["energy_out"] == 16 + 64
