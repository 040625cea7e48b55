"""Tests for the robots.txt policy evaluator and the per-dimension
embedding stats report."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stirling_pdf_spark.functions.html import parse_robots, robots_eval
from stirling_pdf_spark.operators.similarity import emb_dim_stats

ROBOTS = (
    "# comment line\n"
    "User-agent: googlebot\n"
    "Disallow: /google-only\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow:\n"          # empty Disallow = no rule (RFC 9309)
    "Disallow: /tmp\n"
)


def _rules(spark, text=ROBOTS, domain="a.com"):
    return spark.createDataFrame([(domain, text)],
                                 "domain string, robots_txt string")


def _urls(spark, paths, domain="a.com"):
    return spark.createDataFrame(
        [(i, domain, p) for i, p in enumerate(paths)],
        "url_id long, domain string, path string")


def test_parse_robots_star_group_only(spark):
    out = sorted((r["rule_type"], r["rule_path"])
                 for r in parse_robots(_rules(spark)).collect())
    assert out == [("allow", "/private/ok"),
                   ("disallow", "/private"),
                   ("disallow", "/tmp")]


def test_robots_eval_precedence(spark):
    rules = parse_robots(_rules(spark))
    urls = _urls(spark, [
        "/private/x",        # disallow /private
        "/private/ok/page",  # allow wins (longer)
        "/tmpfile",          # byte-prefix match on /tmp
        "/public",           # no rule -> allowed
        "/google-only/x",    # named-agent group ignored for '*'
    ])
    out = {r["url_id"]: r for r in robots_eval(urls, rules).collect()}
    assert out[0]["allowed"] == 0 and out[0]["rule_path"] == "/private"
    assert out[1]["allowed"] == 1 and out[1]["rule_path"] == "/private/ok"
    assert out[2]["allowed"] == 0 and out[2]["rule_path"] == "/tmp"
    assert out[3]["allowed"] == 1 and out[3]["rule_type"] is None
    assert out[4]["allowed"] == 1


def test_robots_eval_tie_prefers_allow(spark):
    text = "User-agent: *\nDisallow: /a/\nAllow: /b/\n"
    # equal-length rules never collide on one path; craft a real tie:
    text = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    rules = parse_robots(_rules(spark, text))
    out = robots_eval(_urls(spark, ["/page/x"]), rules).collect()[0]
    assert out["allowed"] == 1
    assert out["rule_type"] == "allow"


def test_robots_domain_without_rules(spark):
    rules = parse_robots(_rules(spark, domain="a.com"))
    urls = _urls(spark, ["/private/x"], domain="other.com")
    out = robots_eval(urls, rules).collect()[0]
    assert out["allowed"] == 1 and out["rule_type"] is None


def test_emb_dim_stats_closed_form(spark):
    rows = [(0, [0.5, -0.25]), (1, [1.0, 0.75])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    out = {r["dim"]: r for r in emb_dim_stats(df).collect()}
    assert out[0]["n"] == 2
    assert out[0]["sum_fx"] == 500000 + 1000000
    assert out[0]["sum_fx2"] == 500000**2 + 1000000**2
    assert out[1]["min_fx"] == -250000
    assert out[1]["max_fx"] == 750000


def test_emb_dim_stats_matches_float_math(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    out = emb_dim_stats(emb).collect()
    rows = emb.collect()
    n = len(rows)
    dim0 = [math.floor(float(r["embedding"][0]) * 1_000_000)
            for r in rows]
    by_dim = {r["dim"]: r for r in out}
    assert by_dim[0]["n"] == n
    assert by_dim[0]["sum_fx"] == sum(dim0)
    assert by_dim[0]["min_fx"] == min(dim0)
