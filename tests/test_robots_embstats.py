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


def test_sitemap_entries_parse(spark):
    from stirling_pdf_spark.functions.html import sitemap_entries
    xml = ("<urlset><url><loc>https://a.com/1</loc>"
           "<lastmod>2026-02-03</lastmod></url>"
           "<url><loc>https://a.com/2</loc></url>"
           "<url><priority>0.1</priority></url></urlset>")
    df = spark.createDataFrame([("a.com", xml)],
                               "domain string, sitemap_xml string")
    out = sorted(sitemap_entries(df).collect(), key=lambda r: r["pos"])
    assert len(out) == 2  # loc-less entry dropped
    assert out[0]["loc"] == "https://a.com/1"
    assert out[0]["lastmod"] == "2026-02-03"
    assert out[1]["lastmod"] is None


def test_crawl_schedule_politeness(spark):
    from stirling_pdf_spark.functions.html import crawl_schedule
    rows = [(1, "a"), (2, "a"), (5, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "url_id long, domain string")
    out = {r["url_id"]: r
           for r in crawl_schedule(df, delay_ms=500).collect()}
    assert [out[i]["slot"] for i in (1, 2, 5)] == [0, 1, 2]
    assert out[5]["fetch_at_ms"] == 1000
    assert out[3]["slot"] == 0  # other domain proceeds in parallel


def test_script_detect_dominance(spark):
    from stirling_pdf_spark.operators.textstats import script_detect
    rows = [
        (0, "hello world"),
        (1, "hi " + "б" * 10),           # Cyrillic dominates
        (2, "漢" * 4 + " ab"),            # CJK dominates
        (3, "12345 !!!"),                     # no letters -> other
        (4, "ab αβγ"),         # Greek 3 > latin 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in script_detect(df).collect()}
    assert out[0]["script"] == "latin"
    assert out[1]["script"] == "cyrillic" and out[1]["n_cyrillic"] == 10
    assert out[2]["script"] == "cjk" and out[2]["n_cjk"] == 4
    assert out[3]["script"] == "other"
    assert out[4]["script"] == "greek"
