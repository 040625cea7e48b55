"""Corpus wire-compliance audit — the standards-verification report.

Shape parity: /api/v1/security/verify-pdf returns, per document, a
compliance report (standard checked, compliant flag, failure list
with rule ids — VerifyPDFController.java:47-93,
PDFVerificationResult.java:14-36).  The reference delegates the
actual PDF/A rules to the external veraPDF engine (out of scope
here); this operator applies the same report shape to the thing this
engine CAN verify exhaustively — the interleaved span wire format
(kernel/wire.py) — which is exactly the data-quality gate a 100 TB
ingestion pipeline needs before extraction: malformed producers
surface as per-doc rule failures instead of task crashes deep inside
the extraction UDF (whose wire parser is fail-fast by design).

Rules (each a pure column expression — no Python, no shuffle; the
whole audit is map-only over the scan):

  order-dense : span offsets are exactly 0..n-1 (the input-table
                invariant every page-rewriting operator assumes)
  kind-known  : every span kind is one of the wire's ten raw kinds
  text-wire   : kind='text' spans parse as "page|x|y|fs|font\\tbody"
                with a positive integer page (wire.encode_text_run)
  media-ref   : media/attachment spans carry a non-empty media_ref

Output: (doc_id, compliant, total_failures, failed_rules) with
failed_rules the sorted space-join of failing rule ids —
total_failures counts failing RULES (the report's per-standard
rollup, not per-occurrence issues).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RAW_KINDS = ("text", "media", "pagemeta", "annotation", "attachment",
             "formfield", "html", "meta", "rule", "bookmark")

_TEXT_WIRE_RE = r"^[1-9][0-9]*(\|[^|\t]*){4}\t"


def verify_docs(docs: DataFrame) -> DataFrame:
    kinds = ", ".join(f"'{k}'" for k in RAW_KINDS)
    r1 = F.expr(
        "size(spans) = 0 OR "
        "array_sort(transform(spans, s -> s.offset)) = "
        "sequence(0, size(spans) - 1)")
    r2 = F.expr(f"forall(spans, s -> s.kind IN ({kinds}))")
    # functional API, not F.expr: the regex's backslashes must reach
    # rlike verbatim (SQL string literals would eat them)
    r3 = F.forall(
        F.filter("spans", lambda s: s["kind"] == "text"),
        lambda s: s["text"].rlike(_TEXT_WIRE_RE))
    r4 = F.forall(
        F.filter("spans", lambda s: s["kind"].isin("media", "attachment")),
        lambda s: s["media_ref"] != "")
    failed = F.array_sort(F.filter(
        F.array(
            F.when(~r1, F.lit("order-dense")),
            F.when(~r2, F.lit("kind-known")),
            F.when(~r3, F.lit("text-wire")),
            F.when(~r4, F.lit("media-ref")),
        ),
        lambda x: x.isNotNull()))
    return docs.select(
        "doc_id",
        (F.size(failed) == 0).alias("compliant"),
        F.size(failed).cast("long").alias("total_failures"),
        F.array_join(failed, " ").alias("failed_rules"),
    )
