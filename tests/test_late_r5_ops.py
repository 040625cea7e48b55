"""Late round-5 operators: XML export, SemDeDup semantic dedup,
source-mixture sampling, vocabulary census, bigram-LM corpus fit.

The driver gates pin each against its DuckDB oracle at sf0.01; these
tests pin the EDGE semantics the gate corpora do not exercise —
attribute escaping, cross-cluster non-pruning, upsample copies,
tie-break order, short-document fallbacks."""

from __future__ import annotations

from stirling_pdf_spark.kernel import wire
from stirling_pdf_spark.kernel.model import TextRun
from stirling_pdf_spark.kernel.xml_export import (
    render_xml_table,
    xml_doc,
)


def _doc(runs, media=()):
    spans = [("text", wire.encode_text_run(r), "", i)
             for i, r in enumerate(runs)]
    for m in media:
        spans.append(("media", m, "media-x", len(spans)))
    return spans


def _run(page, y, text, size=11.0, font="Helvetica", x=72.0):
    return TextRun(page, x, y, size, font, text)


def _body(xml: str) -> str:
    return xml.split("<document>\n", 1)[1].rsplit("\n</document>", 1)[0]


# ---------------------------------------------------------- XML export

def test_xml_wrapper_heading_paragraph():
    runs = [_run(1, 40.0, "huge title", size=16.0)]
    runs += [_run(1, 80.0 + 14 * i, f"body line {i}") for i in range(10)]
    xml = xml_doc(_doc(runs))
    assert xml.startswith('<?xml version="1.0" encoding="UTF-8"?>\n'
                          "<document>\n")
    assert xml.endswith("\n</document>")
    blocks = _body(xml).split("\n")
    assert blocks[0] == '<heading level="1">huge title</heading>'
    assert blocks[1].startswith("<p>body line 0 body line 1")


def test_xml_escaping_text_and_attribute():
    runs = [_run(1, 72.0, 'x < y & z > "q"')]
    xml = xml_doc(_doc(runs))
    # text content: & < > escaped, double quotes untouched
    assert '<p>x &lt; y &amp; z &gt; "q"</p>' in xml
    # attribute values additionally escape the quote
    assert render_xml_table([]) == ""
    from stirling_pdf_spark.kernel.xml_export import escape_attr
    assert escape_attr('a"b<c') == "a&quot;b&lt;c"


def test_xml_bullets_group_into_list():
    runs = [_run(1, 72.0, "• first item"),
            _run(1, 86.0, "• second item"),
            _run(1, 100.0, "after list")]
    runs += [_run(1, 120.0 + 14 * i, f"pad {i}") for i in range(6)]
    xml = _body(xml_doc(_doc(runs)))
    assert "<list><item>first item</item><item>second item</item></list>" in xml


def test_xml_table_header_row_and_degenerate():
    grid = [["h1", "h2"], ["a", "b"], ["c", "d"]]
    t = render_xml_table(grid)
    assert t.startswith('<table><row header="true">'
                        "<cell>h1</cell><cell>h2</cell></row>")
    assert "<row><cell>a</cell><cell>b</cell></row>" in t
    assert t.endswith("</table>")
    # single-row grid degrades to plain paragraphs, like the HTML path
    assert render_xml_table([["only", "row"]]) == "<p>only</p>\n<p>row</p>"


def test_xml_empty_doc():
    assert xml_doc([]) == ""


def test_xml_image_placeholder():
    runs = [_run(1, 72.0, "text")]
    xml = _body(xml_doc(_doc(runs, media=["1|10.0|20.0|200.0|120.0"])))
    assert '<image alt="image redacted: 200x120pt"/>' in xml


# ------------------------------------------------------------ SemDeDup

def _emb_rows():
    # cluster 0 pole = +e0, cluster 1 pole = +e1 (centroids below).
    # ids 0,1: near-identical in cluster 0 (cos ~1) -> 1 pruned.
    # id 2: cluster 0 but orthogonal-ish direction within the cell?
    #   keep it clearly far from 0/1 instead: negative e2 component.
    # ids 3,4: near-identical to id 0's DIRECTION but assigned to
    #   cluster 1 by a dominant e1 component -> intra-cluster rule
    #   must NOT prune across clusters.
    dim = 4

    def v(*pairs):
        out = [0.0] * dim
        for i, x in pairs:
            out[i] = x
        return out

    return [
        (0, v((0, 1.0))),
        (1, v((0, 1.0), (2, 0.01))),
        (2, v((0, 0.6), (2, -0.8))),
        (3, v((1, 1.0), (0, 0.2))),
        (4, v((1, 1.0), (0, 0.21))),
    ]


def test_semdedup_prunes_within_cluster_only(spark):
    from stirling_pdf_spark.operators.ivf import semdedup_prune

    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    df = spark.createDataFrame(_emb_rows(), ["vec_id", "embedding"])
    out = {r["id"]: (r["cluster"], r["keep"])
           for r in semdedup_prune(df, centroids, threshold=0.9).collect()}
    assert len(out) == 5                      # every vector has a row
    assert out[0] == (0, 1)                   # lowest id survives
    assert out[1] == (0, 0)                   # near-dup of 0, pruned
    assert out[2] == (0, 1)                   # same cluster, cos < .9
    assert out[3] == (1, 1)                   # cluster 1 lowest id
    assert out[4] == (1, 0)                   # near-dup of 3, pruned


# ------------------------------------------------- source-mix sampling

def test_domain_mix_weights_and_determinism(spark):
    from stirling_pdf_spark.operators.textstats import domain_mix_sample

    rows = [(i, f"src{s}") for s in range(4) for i in range(s * 100,
                                                           s * 100 + 64)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = domain_mix_sample(df).toPandas()
    by_dom = out.groupby("domain")["id"].count().to_dict()
    n_ids = out.groupby("domain")["id"].nunique().to_dict()
    assert by_dom["src0"] == 64 and n_ids["src0"] == 64     # 1.0x
    assert 10 <= by_dom["src1"] <= 54                        # ~0.5x
    assert by_dom["src2"] < by_dom["src1"]                   # 0.25x
    assert by_dom["src3"] == 128 and n_ids["src3"] == 64     # 2.0x
    assert set(out[out.domain == "src3"]["copy_idx"]) == {0, 1}
    assert set(out[out.domain == "src0"]["copy_idx"]) == {0}
    # deterministic: a second run reproduces the identical mixture
    again = domain_mix_sample(df).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == \
        sorted(map(tuple, again.values.tolist()))


# --------------------------------------------------- vocabulary census

def test_vocab_topk_ranking_and_ties(spark):
    from stirling_pdf_spark.operators.textstats import vocab_topk

    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a b zz")], ["doc_id", "text"])
    out = [(r["rank"], r["term"], r["n_total"], r["n_docs"])
           for r in vocab_topk(df, k=3).collect()]
    # b: 4 total / 2 docs; a: 3/2; c and zz tie at 1 -> 'c' wins asc
    assert out == [(1, "b", 4, 2), (2, "a", 3, 2), (3, "c", 1, 1)]


# ------------------------------------------------- bigram-LM corpus fit

def test_bigram_lm_fit_hand_computed(spark):
    from stirling_pdf_spark.operators.textstats import bigram_lm_fit

    # corpus: "a b" x2 docs and one "a c" doc ->
    # c1(a)=3; c12(a b)=2, c12(a c)=1
    # doc0/doc1 fit = (1000*2) div 3 = 666; doc2 = (1000*1) div 3 = 333
    df = spark.createDataFrame(
        [("d0", "a b"), ("d1", "a b"), ("d2", "a c"), ("d3", "solo")],
        ["doc_id", "text"])
    out = {r["id"]: (r["n_bigrams"], r["fit_x1000"])
           for r in bigram_lm_fit(df).collect()}
    assert out["d0"] == (1, 666)
    assert out["d1"] == (1, 666)
    assert out["d2"] == (1, 333)
    assert out["d3"] == (0, 0)                # <2 words: zero row kept


def test_chat_format_loss_span_points_at_assistant_content(spark):
    from stirling_pdf_spark.operators.serialize import (
        CHAT_SYSTEM,
        chat_format_records,
    )

    docs = spark.createDataFrame(
        [("a", "w1 w2 w3 w4 w5 w6 w7 w8 answer text here"),
         ("b", "only three words")],
        "doc_id string, text string")
    out = {r["id"]: r for r in chat_format_records(docs).collect()}
    a = out["a"]
    # the loss span must slice exactly the assistant content
    assert a["rendered"][a["loss_start"]:a["loss_end"]] == \
        "answer text here"
    assert a["rendered"].startswith(
        CHAT_SYSTEM + "<|user|>w1 w2 w3 w4 w5 w6 w7 w8<|end|>")
    assert a["rendered"].endswith("<|end|>")
    assert a["n_loss_chars"] == len("answer text here")
    # short docs: empty assistant turn, empty (but well-formed) span
    b = out["b"]
    assert b["loss_start"] == b["loss_end"]
    assert b["rendered"][b["loss_start"] - 1] == ">"


def test_meta_robots_attribute_orders_and_none(spark):
    from stirling_pdf_spark.functions.html import meta_robots

    docs = spark.createDataFrame(
        [("a", '<head><meta name="robots" content="NOINDEX"></head>'),
         ("b", '<head><meta content="nofollow, noarchive" '
               'name="robots"></head>'),
         ("c", '<head><meta name="robots" content="none"></head>'),
         ("d", "<head></head>"),
         # robots meta for a DIFFERENT agent must not match
         ("e", '<head><meta name="googlebot" content="noindex"></head>')],
        "doc_id string, html string")
    out = {r["id"]: (r["noindex"], r["nofollow"], r["keep"])
           for r in meta_robots(docs).collect()}
    assert out == {"a": (1, 0, 0), "b": (0, 1, 1), "c": (1, 1, 0),
                   "d": (0, 0, 1), "e": (0, 0, 1)}


def test_section_chunks_breadcrumbs_and_h2_reset(spark):
    from stirling_pdf_spark.operators.retrieval import section_chunks

    text = ("before any heading\n"
            "# One\nbody a\nbody b\n"
            "## One.A\nnested\n"
            "# Two\n"          # a new H1 must clear the H2 crumb
            "after two\n\n")   # blank line dropped
    docs = spark.createDataFrame(
        [("a", text)], "doc_id string, text string")
    rows = sorted((r["section_idx"], r["breadcrumb"], r["n_lines"],
                   r["chunk_text"])
                  for r in section_chunks(docs).collect())
    assert rows == [
        (0, "", 1, "before any heading"),
        (1, "One", 2, "body a\nbody b"),
        (2, "One > One.A", 1, "nested"),
        (3, "Two", 1, "after two"),
    ]


def test_section_chunks_heading_only_sections_vanish(spark):
    from stirling_pdf_spark.operators.retrieval import section_chunks

    docs = spark.createDataFrame(
        [("a", "# Empty\n# Full\ncontent")],
        "doc_id string, text string")
    rows = [(r["section_idx"], r["breadcrumb"], r["chunk_text"])
            for r in section_chunks(docs).collect()]
    assert rows == [(0, "Full", "content")]
