"""Driver-contract guards for __spark_entry__ — pure Python, no Spark.

The driver records only the FIRST 50 queries() entries, compares each
against oracle_sql() by sorted-column value hash, and smoke-runs
entry(). These tests keep the registry honest without a cluster.
"""

from __future__ import annotations

import inspect

import __spark_entry__ as E

ROWS_ONLY = {"extract_synth_corpus"}

# gates that never had a driver row before round 4 — they must sit in
# the 50-entry window so the driver records them this round
R4_NEW = [
    "e13_whole_word_digit", "s9_page_numbers", "streaming_ingest_resume",
    "attachment_crud", "toc_set_outline", "text_scrub_pii",
    "dedup_paragraphs", "f2_filter_contains_image", "s10_remove_images",
    "multimodal_decode_jpeg", "s3_split_doc_count", "s3_split_byte_size",
    "s11_flatten_forms", "s9_watermark_grid", "remove_blank_pages",
    "sanitize_pdf", "security_password", "text_url_extract",
    "text_domain_caps", "show_javascript", "dedup_decontaminate",
    "to_markdown", "to_markdown_tables", "md_to_pdf_ingest",
]


def test_every_query_has_oracle_or_is_declared_rows_only():
    qs = E.queries()
    sqls = E.oracle_sql()
    missing = {name for name in qs if name not in sqls}
    assert missing == ROWS_ONLY
    # no orphan oracles either
    assert not set(sqls) - set(qs)


def test_new_round4_gates_sit_inside_the_driver_window():
    order = list(E.queries())
    window = set(order[:50])
    outside = [n for n in R4_NEW if n not in window]
    assert not outside, f"new gates outside the 50-row window: {outside}"


def test_query_callables_accept_spark_and_sf_dir():
    for name, fn in E.queries().items():
        params = list(inspect.signature(fn).parameters.values())
        assert len(params) >= 2, name
        extra = params[2:]
        assert all(p.default is not inspect.Parameter.empty
                   for p in extra), (
            f"{name}: positional params beyond (spark, sf_dir)")


def test_oracle_sql_strings_are_plain_selects():
    for name, sql in E.oracle_sql().items():
        head = sql.strip().split(None, 1)[0].upper()
        assert head in ("SELECT", "WITH"), (name, head)
