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
