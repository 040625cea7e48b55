"""Title inference from extracted elements (reference op E18,
AutoRenameController.java:106-138 /auto-rename).

The reference's algorithm, reproduced over the structured elements
table:

  1. visual lines with a per-line font size (the stripper's
     maxFontSizeInLine — here max over the line's elements);
  2. merge ADJACENT lines with the same font size, joining with a
     single space (:104-113);
  3. stable-sort candidates by font size descending and take the first
     (:116-119 — Java's List.sort is stable, so ties keep document
     order);
  4. the result is used as a filename only when shorter than 255 chars
     (:146) — surfaced here as the ``usable`` flag rather than a drop,
     so the operator stays total.

Everything is window/aggregate column math over the elements DataFrame
— extract once, infer titles for the whole corpus in one pass (no
per-document re-parse, unlike the reference's one-PDF-per-request
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def infer_titles(elements: DataFrame) -> DataFrame:
    """elements (operators/elements.py) -> (doc_id, title,
    title_fs_x100, usable). One row per document that has text."""
    els = elements.filter(F.col("kind") == "text")
    # visual line = same (page, y); line font = max element size, line
    # text = elements joined in z-order
    lines = els.groupBy("doc_id", "page", "y").agg(
        F.max("font_size").alias("fs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("z_order", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("line"),
        F.min("z_order").alias("zmin"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("page", "zmin")
    numbered = lines.withColumn("rn", F.row_number().over(w_doc))
    # gaps-and-islands: adjacent lines with equal font size share grp
    w_fs = Window.partitionBy("doc_id", "fs").orderBy("rn")
    grouped = numbered.withColumn(
        "grp", F.col("rn") - F.row_number().over(w_fs)
    )
    cand = grouped.groupBy("doc_id", "fs", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("title"),
        F.min("rn").alias("first_rn"),
    )
    w_pick = Window.partitionBy("doc_id").orderBy(
        F.desc("fs"), F.asc("first_rn")
    )
    return (
        cand.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "doc_id",
            "title",
            (F.col("fs") * 100).cast("long").alias("title_fs_x100"),
            (F.length("title") < 255).cast("int").alias("usable"),
        )
    )
