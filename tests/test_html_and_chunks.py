"""HTML ops (H1-H5), EML parsing (H6), chunking (E24), and page ops
(S2/S7/E10) unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stirling_pdf_spark.functions.html import (
    strip_positioned_css,
    strip_scripts_styles,
    text_to_html,
)
from stirling_pdf_spark.kernel.chunker import chunk_text, chunk_text_windows
from stirling_pdf_spark.kernel.sanitize import sanitize_html
from stirling_pdf_spark.operators.emlparse import build_eml, parse_eml


# ------------------------------------------------------------ H1 sanitize

def test_sanitize_drops_script_with_content():
    out = sanitize_html("<p>hi</p><script>evil()</script><b>ok</b>")
    assert out == "<p>hi</p><b>ok</b>"


def test_sanitize_unwraps_unknown_tags():
    assert sanitize_html("<custom><i>x</i></custom>") == "<i>x</i>"


def test_sanitize_attribute_allowlist_and_unsafe_urls():
    out = sanitize_html('<a href="http://x" onclick="evil()">l</a>')
    assert out == '<a href="http://x">l</a>'
    out = sanitize_html('<img src="javascript:alert(1)" alt="a">')
    assert out == '<img alt="a" />'
    out = sanitize_html('<a href="javascript:x">l</a>')
    assert out == "<a>l</a>"


def test_sanitize_noscript_dropped_tables_kept():
    out = sanitize_html("<noscript>no</noscript><table><tr><td colspan=\"2\">c</td></tr></table>")
    assert out == '<table><tr><td colspan="2">c</td></tr></table>'


# ------------------------------------------------------- H2/H3/H5 columns

def test_strip_and_autolink_columns(spark):
    df = spark.createDataFrame(
        [(1, "<script>x\ny</script>keep<style>s</style> pos position: fixed; end")],
        ["id", "html"],
    )
    out = df.select(
        strip_positioned_css(strip_scripts_styles(F.col("html"))).alias("c")
    ).collect()[0]["c"]
    assert out == "keep pos  end"

    df2 = spark.createDataFrame([(1, "see http://a.b/c & mail x@y.io\nend")], ["id", "t"])
    h = df2.select(text_to_html(F.col("t")).alias("h")).collect()[0]["h"]
    assert '<a href="http://a.b/c">http://a.b/c</a>' in h
    assert '<a href="mailto:x@y.io">x@y.io</a>' in h
    assert "&amp;" in h and "<br>" in h


# ---------------------------------------------------------------- H6 EML

def test_eml_roundtrip_with_attachments():
    raw = build_eml("d1", "hello world\nline two", attachments=2)
    parsed = parse_eml(raw)
    assert parsed["subject"] == "doc d1"
    assert parsed["from_addr"] == "sender@example.com"
    assert parsed["body"].rstrip("\n") == "hello world\nline two"
    assert parsed["n_attachments"] == 2


def test_eml_unicode_headers_rfc2047():
    raw = build_eml("dü", "bödy tëxt")
    assert b"=?utf-8?" in raw.lower()  # RFC 2047 encoded header present
    parsed = parse_eml(raw)
    assert parsed["subject"] == "doc dü"
    assert parsed["body"].rstrip("\n") == "bödy tëxt"


# ------------------------------------------------------------ E24 chunker

def test_chunk_text_sentences_pack_and_overlap():
    sents = [f"Sentence number {i} is exactly here." for i in range(30)]
    text = " ".join(sents)
    chunks = chunk_text(text, max_len=120, overlap=40)
    assert all(len(c) <= 120 for c in chunks)
    # every sentence appears somewhere
    joined = " ".join(chunks)
    assert all(s in joined for s in sents)
    # overlap: each chunk after the first starts with the previous tail
    for prev, cur in zip(chunks, chunks[1:]):
        first_sent = cur.split(".")[0] + "."
        assert first_sent in prev or len(first_sent) > 40


def test_chunk_text_long_unit_hard_wraps():
    text = "x" * 1200
    chunks = chunk_text(text, max_len=512, overlap=64)
    assert all(len(c) <= 512 for c in chunks)
    assert "".join(chunks) == text


def test_chunk_text_empty():
    assert chunk_text("") == []


def test_chunk_windows_matches_python(spark):
    rows = [(1, "abc"), (2, "x" * 600), (3, "y" * 512)]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r["id"]: r["c"] for r in
           df.select("id", chunk_text_windows(F.col("t")).alias("c")).collect()}
    assert got[1] == ["abc"]
    assert got[3] == ["y" * 512]
    assert got[2][0] == "x" * 512 and got[2][1] == "x" * 152
    # stride 448: second window starts at 449 -> 600-448=152 chars
