"""Stateful streaming sequence packer (applyInPandasWithState).

The batch packer (operators/packing.pack_sequences) assigns every
document a global token offset with a two-phase prefix sum. Its
streaming sibling must do the same over an unbounded feed, where the
running offset is CUSTOM state no built-in windowed aggregation can
express — exactly the applyInPandasWithState use case (public Spark
API, SPARK-40434): an arbitrary user value per group key, persisted
in the streaming state store, recovered on restart.

Group key = pack shard. Each shard is an independent token stream
with its own running offset, so parallelism equals the shard count —
the state-partitioning story at 10^12 docs (one hot global offset
would serialize the feed; sharded offsets shard the state store).
State per shard = ONE bigint (tokens consumed so far): constant-size
state regardless of history, never evicted, never grows.

Ordering contract: the feed delivers doc_id-ascending slices
(maxFilesPerTrigger=1 processes one slice per micro-batch, oldest
first) and each micro-batch sorts its rows by doc_id before
assigning offsets. Under that contract the emitted rows are
bit-identical to the batch operator over the concatenated feed —
which is what the gate pins (batch-stream parity against the same
DuckDB oracle as pack_sequences).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_tokens", T.LongType(), False),
    T.StructField("shard", T.IntegerType(), False),
])

OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_tokens", T.LongType(), False),
    T.StructField("seq_id", T.LongType(), False),
    T.StructField("tok_start", T.LongType(), False),
    T.StructField("n_in_seq", T.LongType(), False),
])

STATE_SCHEMA = "off long"


def _pack_group(key, pdfs, state: GroupState, seq_len: int = 512):
    off = state.get[0] if state.exists else 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    out = {k: [] for k in ("doc_id", "n_tokens", "seq_id",
                           "tok_start", "n_in_seq")}
    # the feed contract guarantees slice-level ordering; the sort
    # makes row order within a micro-batch canonical as well
    rows = rows.sort_values("doc_id")
    for doc_id, n in zip(rows["doc_id"], rows["n_tokens"]):
        n = int(n)
        if n <= 0:
            continue
        for seq in range(off // seq_len, (off + n - 1) // seq_len + 1):
            base = seq * seq_len
            first = max(off, base)
            out["doc_id"].append(int(doc_id))
            out["n_tokens"].append(n)
            out["seq_id"].append(seq)
            out["tok_start"].append(first - base)
            out["n_in_seq"].append(min(off + n, base + seq_len) - first)
        off += n
    state.update((off,))
    if not out["doc_id"]:
        # empty frames need explicit object dtype or Arrow chokes
        yield pd.DataFrame({k: pd.Series([], dtype="int64")
                            for k in out})
    else:
        yield pd.DataFrame(out)


def stream_pack(spark, input_dir: str, out_dir: str,
                checkpoint_dir: str, seq_len: int = 512):
    """Start (availableNow) the stateful packer: one micro-batch per
    input slice, the per-shard running offset carried in the state
    store across batches AND restarts. Returns the query."""
    docs = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    packed = docs.groupBy("shard").applyInPandasWithState(
        lambda key, pdfs, state: _pack_group(key, pdfs, state, seq_len),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        packed.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
