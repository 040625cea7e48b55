"""Multi-op pipeline composition (reference Trace C, SURVEY.md §3.3:
PipelineProcessor.java:79-163).

The reference chains operations over a working file set by looping and
self-HTTP-calling each endpoint; filters drop files from the working
set mid-chain (:150-156). Here a pipeline IS a chained DataFrame
program: each step is a registered docs->docs transformation, filters
are DataFrame filters (F8 semantics exactly), and Catalyst sees the
whole chain as one plan — validation happens at analysis time instead
of the reference's OpenAPI-schema check (:111-115), and no
intermediate materialization exists unless a step needs a shuffle.

Config shape: a list of (op_name, kwargs) pairs, mirroring the
reference's PipelineConfig operation list.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import pageops
from ..operators.extract_pipeline import extract_spans
from ..operators.search import redact_spans

# docs -> docs steps (raw interleaved shape in and out)
_DOC_OPS: dict[str, Callable] = {
    "rotate90": pageops.rotate_pages_90,
    "set_rotation": pageops.set_page_rotation,
    "scale": pageops.scale_pages,
    "crop": pageops.crop_pages,
    "single_page": pageops.to_single_page,
    "n_up": pageops.n_up,
    "booklet": pageops.booklet_impose,
    "stamp": pageops.add_page_stamps,
    "split_at_pages": pageops.split_at_pages,
    "split_every_n_pages": pageops.split_every_n_pages,
    "split_by_sections": pageops.split_by_sections,
    "auto_split": pageops.auto_split_at_markers,
    "rearrange": pageops.rearrange_pages,
    "merge": pageops.merge_docs,
}


def _filter_min_spans(docs: DataFrame, n: int) -> DataFrame:
    return docs.filter(F.size("spans") >= n)


def _filter_has_kind(docs: DataFrame, kind: str) -> DataFrame:
    return docs.filter(F.exists("spans", lambda s: s["kind"] == kind))


def _filter_contains_text(docs: DataFrame, phrase: str) -> DataFrame:
    return docs.filter(
        F.exists("spans",
                 lambda s: (s["kind"] == "text") & s["text"].contains(phrase))
    )


def _filter_rotation(docs: DataFrame, rotation: int,
                     comparator: str = "EQUAL") -> DataFrame:
    return pageops.filter_page_rotation(docs, rotation, comparator) \
        .select("doc_id", "spans")


def _filter_page_size(docs: DataFrame, size_name: str,
                      comparator: str = "EQUAL") -> DataFrame:
    return pageops.filter_page_size(docs, size_name, comparator) \
        .select("doc_id", "spans")


# filter steps: empty result drops the doc from the working set (F8,
# PipelineProcessor.java:150-156)
_FILTER_OPS: dict[str, Callable] = {
    "filter_min_spans": _filter_min_spans,
    "filter_has_kind": _filter_has_kind,
    "filter_contains_text": _filter_contains_text,
    "filter_rotation": _filter_rotation,
    "filter_page_size": _filter_page_size,
}

# terminal steps: docs -> spans_out (and spans_out -> spans_out)
_TERMINAL_OPS: dict[str, Callable] = {
    "extract": extract_spans,
    "redact": redact_spans,
}

PIPELINE_OPS = tuple(_DOC_OPS) + tuple(_FILTER_OPS) + tuple(_TERMINAL_OPS)


def run_pipeline(docs: DataFrame,
                 config: list[tuple[str, dict]]) -> DataFrame:
    """Apply the configured operation chain. Ops validate eagerly (an
    unknown name raises before any job runs — the analysis-time
    equivalent of the reference's pre-flight validation)."""
    for name, _ in config:
        if name not in _DOC_OPS and name not in _FILTER_OPS \
                and name not in _TERMINAL_OPS:
            raise ValueError(f"unknown pipeline op {name!r}; "
                             f"available: {sorted(PIPELINE_OPS)}")
    df = docs
    extracted = False
    for name, kwargs in config:
        if name in _DOC_OPS:
            if extracted:
                raise ValueError(f"{name!r} operates on raw docs but the "
                                 "pipeline already ran 'extract'")
            df = _DOC_OPS[name](df, **kwargs)
        elif name in _FILTER_OPS:
            df = _FILTER_OPS[name](df, **kwargs)
        elif name == "extract":
            df = extract_spans(df, **kwargs)
            extracted = True
        elif name == "redact":
            if not extracted:
                raise ValueError("'redact' requires a prior 'extract' step")
            df = redact_spans(df, **kwargs)
    return df
