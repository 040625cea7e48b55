"""Data-layout optimization: Z-order clustering + file-level stats.

Iceberg/Delta tables prune files by per-file column min/max ranges;
that only pays off when co-queried columns are *clustered* so each
file covers a narrow range of both. Z-ordering (bit-interleaving the
column values — the Morton curve used by Delta OPTIMIZE ZORDER and
Iceberg's sort-order rewrite) achieves that for two dimensions at
once. The reference has no table-layout surface (single-file
endpoints); this operator is the training-pipeline analogue of its
"organize pages" family applied to table maintenance.

Everything is integer: dims quantize to 8 bits, the Morton index is a
sum of shifted bits, files are fixed Z ranges, and the emitted
min/max manifest is exactly what a format's pruning index stores. The
gate's oracle recomputes the interleave in SQL; the wide/narrow span
of each dimension inside a file (vs a naive doc_id layout) is visible
in the manifest the query returns.

At scale: the Z index is one narrow projection, the file assignment a
range partition by constant — one shuffle, and the manifest aggregate
is map-side partial. No sampling, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # per-dimension quantization
FILES = 64  # 2^16 Morton values / 1024 per file


def _interleave(x: str, y: str):
    """Morton index: x bits to odd positions, y bits to even."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i + 1}))")
        terms.append(f"(shiftleft(shiftright({y}, {i}) & 1, {2 * i}))")
    return F.expr(" + ".join(terms))


def zorder_manifest(docs: DataFrame, id_col: str = "doc_id",
                    source_col: str = "source",
                    length_col: str = "n_chars") -> DataFrame:
    """Assign every doc a Z-ordered file and emit the pruning
    manifest: (file_id, n_docs, min/max of both quantized dims, Z
    range). Dim x = first md5 byte of the source (domain affinity),
    dim y = capped length/4 bucket."""
    h = F.md5(F.col(source_col).cast("binary"))
    q = docs.select(
        F.col(id_col).alias("id"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("x"),
        F.least(F.lit(255), (F.col(length_col) / 4).cast("int"))
        .alias("y"))
    z = q.select("id", "x", "y", _interleave("x", "y").alias("z"))
    files = z.select(
        "id", "x", "y", "z",
        (F.col("z") / ((1 << (2 * ZBITS)) // FILES)).cast("int")
        .alias("file_id"))
    return files.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("x").cast("int").alias("min_x"),
        F.max("x").cast("int").alias("max_x"),
        F.min("y").cast("int").alias("min_y"),
        F.max("y").cast("int").alias("max_y"),
        F.min("z").cast("long").alias("min_z"),
        F.max("z").cast("long").alias("max_z"))
