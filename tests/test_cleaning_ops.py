"""URL canonicalization, mojibake repair, font inventory."""

from __future__ import annotations

from stirling_pdf_spark.operators.textstats import fix_encoding, normalize_urls


def test_normalize_urls_rules(spark):
    cases = [
        # scheme/host case-fold + default https port + fragment +
        # tracking params (case-sensitive names)
        ("a", "HTTPS://Ex.COM:443/P/q?utm_source=x&id=7&fbclid=1#f",
         "https://ex.com/P/q?id=7"),
        # http default port, empty path -> '/', query dies entirely
        ("b", "http://www.M.ORG:80?utm_campaign=z", "http://www.m.org/"),
        # bare www promotion; 'REF=up' (uppercase) survives
        ("c", "www.B.net/x?ref=home&q=1&REF=up",
         "http://www.b.net/x?q=1&REF=up"),
        # non-default port survives; no query
        ("d", "https://h.io:8443/a", "https://h.io:8443/a"),
        # tracking param mid-query; utm_ prefix family
        ("e", "http://h.io/p?a=1&utm_medium=m&b=2", "http://h.io/p?a=1&b=2"),
    ]
    df = spark.createDataFrame(cases, "id string, url string, want string")
    got = {r["id"]: r["canon_url"]
           for r in normalize_urls(df.select("id", "url")).collect()}
    for i, _u, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_fix_encoding_guards(spark):
    rows = [
        ("latin1-utf8", "cafÃ©", "café", 1),
        ("ascii", "plain", "plain", 0),
        ("three-byte", "itâs", "it’s", 1),
        # indicator present but a dangling lead byte makes the whole
        # string invalid UTF-8 -> untouched
        ("invalid", "xÃ©Ã y", "xÃ©Ã y", 0),
        # already-correct Latin-1 text: e-acute + space is not valid
        # UTF-8, so the guard refuses the (lossy) repair
        ("real-accent", "café au lait", "café au lait", 0),
        # beyond Latin-1: reverse encode would be lossy -> untouched
        ("wide", "snow ☃ man Ã©",
         "snow ☃ man Ã©", 0),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _w, _c in rows],
                               "id string, text string")
    got = {r["id"]: (r["fixed"], r["changed"])
           for r in fix_encoding(df).collect()}
    for i, _t, want, changed in rows:
        assert got[i] == (want, changed), (i, got[i])


def test_font_info_inventory_and_empty_doc(spark):
    from stirling_pdf_spark.kernel import wire
    from stirling_pdf_spark.kernel.model import TextRun
    from stirling_pdf_spark.operators.elements import font_info

    def run(font, content):
        return dict(kind="text",
                    text=wire.encode_text_run(
                        TextRun(1, 72.0, 72.0, 11.0, font, content)),
                    media_ref="", offset=0)

    rows = [
        ("doc-2", [run("Helvetica", "a"), run("Courier", "b"),
                   run("Helvetica", "c"),
                   dict(kind="bookmark", text="0|1|t", media_ref="",
                        offset=3)]),
        ("doc-empty", []),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    got = {r["doc_id"]: r for r in font_info(df).collect()}
    assert got["doc-2"]["font_count"] == 2
    assert got["doc-2"]["fonts"] == "Courier,Helvetica"
    assert got["doc-empty"]["font_count"] == 0
    assert got["doc-empty"]["fonts"] == ""


def test_gopher_rules_each_fire_independently(spark):
    from stirling_pdf_spark.operators.textstats import (
        GOPHER_STOPWORDS, gopher_quality_filter,
    )

    good = ("the be words of and that have with " * 7).strip()  # 56 words
    rows = [
        ("keep", good),
        ("short", "the be of and"),                      # r_wc fails
        ("longwords", " ".join(["the", "be"] + ["x" * 40] * 54)),  # r_mwl
        ("symbols", good + " " + "# " * 12),             # r_sym
        ("bullets", good + "".join("\n- b" for _ in range(10))),   # r_bullet
        ("ellipsis", good + "\nwait...\nmore...\nend..."),          # r_ell
        ("numeric", good + " " + "123 " * 60),           # r_alpha
        ("nostop", "alpha beta gamma " * 20),            # r_stop
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["id"]: r for r in gopher_quality_filter(df).collect()}
    assert got["keep"]["keep"] == 1
    assert got["short"]["r_wc"] == 0
    assert got["longwords"]["r_mwl"] == 0
    assert got["symbols"]["r_sym"] == 0
    assert got["bullets"]["r_bullet"] == 0 and got["bullets"]["keep"] == 0
    assert got["ellipsis"]["r_ell"] == 0
    assert got["numeric"]["r_alpha"] == 0
    assert got["nostop"]["r_stop"] == 0
    # every failing doc fails ONLY at its targeted rule or keep
    for name in ("short", "longwords", "symbols", "bullets",
                 "ellipsis", "numeric", "nostop"):
        assert got[name]["keep"] == 0
    assert len(GOPHER_STOPWORDS) == 8


def test_lm_quality_partition_mean_rule(spark):
    from stirling_pdf_spark.operators.textstats import lm_quality_partition

    # d1 repeats the corpus-dominant bigram; d2 spends most of its
    # 'a' continuations on minority bigrams (fit 625 vs 525, mean
    # 575) -> exactly one head, one tail around the mean
    df = spark.createDataFrame(
        [("d1", "a a a a a a"), ("d2", "a b a b a c")],
        "doc_id string, text string")
    got = {r["id"]: r for r in lm_quality_partition(df).collect()}
    assert got["d1"]["head"] == 1
    assert got["d2"]["head"] == 0
    assert got["d1"]["fit_x1000"] > got["d2"]["fit_x1000"]
