"""Stateful streaming sequence packer (streaming/packer.py,
applyInPandasWithState): per-shard running-offset state across
micro-batches and a checkpoint restart, against a pure-Python packer."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

import pytest

from stirling_pdf_spark.streaming.packer import stream_pack

L = 16  # short sequences so every doc straddles boundaries


def _py_pack(docs: list[tuple[int, int]], seq_len: int = L):
    """(doc_id, n_tokens) in feed order -> expected rows."""
    rows, off = [], 0
    for doc_id, n in docs:
        for seq in range(off // seq_len, (off + n - 1) // seq_len + 1):
            base = seq * seq_len
            first = max(off, base)
            rows.append((doc_id, n, seq, first - base,
                         min(off + n, base + seq_len) - first))
        off += n
    return sorted(rows)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="t_stream_pack_")
    os.makedirs(f"{base}/in")
    yield base, f"{base}/in", f"{base}/out", f"{base}/cp"
    shutil.rmtree(base, ignore_errors=True)


def _write_slice(spark, base, in_dir, idx, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, shard int")
    stage = f"{base}/stage{idx}"
    df.coalesce(1).write.parquet(stage)
    dst = f"{in_dir}/slice{idx}.parquet"
    shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], dst)
    t = time.time() - 40 + idx * 10
    os.utime(dst, (t, t))


def test_state_spans_batches_shards_and_restart(spark, dirs):
    base, in_dir, out_dir, cp = dirs
    # two shards interleaved in the same slices: state must be keyed
    s0 = [(1, 10), (2, 7), (3, 40), (4, 5)]
    s1 = [(11, 33), (12, 3), (13, 20)]
    _write_slice(spark, base, in_dir, 0,
                 [(1, 10, 0), (2, 7, 0), (11, 33, 1)])
    _write_slice(spark, base, in_dir, 1, [(3, 40, 0), (12, 3, 1)])
    stream_pack(spark, in_dir, out_dir, cp, seq_len=L).awaitTermination()
    # restart from checkpoint with one more slice: recovered offsets
    # must continue where run 1 left off
    _write_slice(spark, base, in_dir, 2, [(4, 5, 0), (13, 20, 1)])
    stream_pack(spark, in_dir, out_dir, cp, seq_len=L).awaitTermination()

    got = sorted(
        tuple(r) for r in spark.read.parquet(out_dir)
        .select("doc_id", "n_tokens", "seq_id", "tok_start", "n_in_seq")
        .collect()
    )
    assert got == sorted(_py_pack(s0) + _py_pack(s1))


def test_zero_token_docs_skipped(spark, dirs):
    base, in_dir, out_dir, cp = dirs
    _write_slice(spark, base, in_dir, 0, [(1, 0, 0), (2, 4, 0)])
    stream_pack(spark, in_dir, out_dir, cp, seq_len=L).awaitTermination()
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert got == [(2, 4, 0, 0, 4)]
