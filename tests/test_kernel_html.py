"""Hand-computed goldens for HTML boilerplate stripping (H1-H3 + H7)."""

from stirling_pdf_spark.kernel.html_extract import extract_main_blocks

LONG = "This paragraph has more than twenty five characters of real content."


def test_script_style_stripped():
    html = f"<body><script>var x=1;</script><style>.a{{}}</style><p>{LONG}</p></body>"
    assert extract_main_blocks(html) == [LONG]


def test_noscript_dropped():
    html = f"<body><noscript>fallback text that is long enough to keep</noscript><p>{LONG}</p></body>"
    assert extract_main_blocks(html) == [LONG]


def test_positioned_elements_dropped():
    html = (
        f'<body><div style="position:fixed">A long enough fixed banner text here</div>'
        f'<div style="POSITION: Absolute">another long enough positioned element</div>'
        f"<p>{LONG}</p></body>"
    )
    assert extract_main_blocks(html) == [LONG]


def test_nav_footer_aside_dropped():
    html = (
        f"<body><nav>some long navigation text that would otherwise qualify</nav>"
        f"<p>{LONG}</p>"
        f"<aside>a long enough sidebar remark that should be dropped</aside>"
        f"<footer>long enough copyright footer text to pass length</footer></body>"
    )
    assert extract_main_blocks(html) == [LONG]


def test_boiler_class_dropped():
    html = (
        f'<body><div class="sidebar">long enough sidebar class content here ok</div>'
        f'<div id="main-menu">long enough menu id content that would qualify</div>'
        f"<p>{LONG}</p></body>"
    )
    assert extract_main_blocks(html) == [LONG]


def test_link_density():
    links = '<a href="/a">one link text</a> <a href="/b">two link text</a>'
    html = f"<body><div>{links}</div><p>{LONG}</p></body>"
    # the div is nearly all link text -> dropped
    assert extract_main_blocks(html) == [LONG]


def test_short_blocks_dropped_headings_kept():
    html = f"<body><p>too short</p><h2>A Heading</h2><p>{LONG}</p></body>"
    assert extract_main_blocks(html) == ["A Heading", LONG]


def test_linked_heading_dropped():
    html = f'<body><h2><a href="/x">Linked Heading</a></h2><p>{LONG}</p></body>'
    assert extract_main_blocks(html) == [LONG]


def test_document_order_and_whitespace_normalized():
    html = (
        f"<body><article><p>  First   paragraph {LONG}</p>"
        f"<p>Second\n\nparagraph {LONG}</p></article></body>"
    )
    out = extract_main_blocks(html)
    assert out == [f"First paragraph {LONG}", f"Second paragraph {LONG}"]


def test_justext_blocks_classes_and_context_relabel(spark):
    from stirling_pdf_spark.functions.html import justext_blocks

    good = "the quick brown fox jumps over the lazy dog again and again"
    near = "words without stopwords here now five six seven eight nine ten"
    html = (
        "<html><body>"
        f"<p><a href=\"/nav\">home page link</a> x</p>"   # link-dense: bad
        f"<p>{good}</p>"                                   # good
        f"<p>{near}</p>"                                   # near, next to good
        "<p>tiny one</p>"                                  # < 4 words: bad
        f"<p>{near}</p>"                                   # near, adj to bad/none
        "</body></html>")
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = {r["para_idx"]: r for r in justext_blocks(df).collect()}
    assert rows[0]["cls_init"] == "bad" and rows[0]["cls_final"] == "bad"
    assert rows[1]["cls_init"] == "good"
    assert rows[2]["cls_init"] == "near" and rows[2]["cls_final"] == "good"
    assert rows[3]["cls_init"] == "bad"
    # isolated near-good (neighbors bad / edge) demotes to bad
    assert rows[4]["cls_init"] == "near" and rows[4]["cls_final"] == "bad"


def test_justext_blocks_counts_are_exact(spark):
    from stirling_pdf_spark.functions.html import justext_blocks

    html = "<html><body><p><a href=\"/x\">a b</a> the c</p></body></html>"
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    [r] = justext_blocks(df).collect()
    assert r["n_words"] == 4
    assert r["n_stop"] == 2            # 'a' and 'the'
    assert r["link_chars"] == 3        # 'a b'
    assert r["total_chars"] == len("a b the c")


def test_html_to_spans_order_and_kinds(spark):
    from stirling_pdf_spark.functions.html import html_to_spans

    html = ('<html><body><p>one two</p>'
            '<img src="media-abc-0">'
            '<p>three <b>four</b></p>'
            '<img src="media-def-1"><p>five</p></body></html>')
    df = spark.createDataFrame([(3, html)], "doc_id long, html string")
    rows = [(r["offset"], r["kind"], r["text"], r["media_ref"])
            for r in html_to_spans(df).orderBy("offset").collect()]
    assert rows == [
        (0, "text", "one two", ""),
        (1, "media", "", "media-abc-0"),
        (2, "text", "three four", ""),
        (3, "media", "", "media-def-1"),
        (4, "text", "five", ""),
    ]
