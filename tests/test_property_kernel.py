"""Property-based kernel tests (hypothesis): invariants that must hold
for ANY input, not just the synthesized archetypes."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from stirling_pdf_spark.functions.page_select import parse_page_selection
from stirling_pdf_spark.kernel.chunker import chunk_text
from stirling_pdf_spark.kernel.extract import extract_doc
from stirling_pdf_spark.kernel.lines import cluster_lines
from stirling_pdf_spark.kernel.model import TextRun
from stirling_pdf_spark.kernel import wire

_WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=8)

runs_strategy = st.lists(
    st.builds(
        TextRun,
        page=st.just(1),
        x=st.floats(0, 500, allow_nan=False),
        y=st.floats(0, 700, allow_nan=False),
        font_size=st.sampled_from([9.0, 11.0, 14.0]),
        font=st.just("F"),
        content=st.text(alphabet="abc x", min_size=0, max_size=20),
    ),
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(runs_strategy)
def test_cluster_lines_partition_invariants(runs):
    lines = cluster_lines(runs)
    visible = [r for r in runs if r.content.strip()]
    assert sum(len(ln.runs) for ln in lines) == len(visible)
    seen = set()
    for ln in lines:
        assert ln.runs, "empty line"
        for r in ln.runs:
            assert id(r) not in seen
            seen.add(id(r))
        assert ln.x1 <= ln.x2 and ln.y1 <= ln.y2
        # cached bbox equals recomputed bbox
        assert ln.x1 == min(r.x for r in ln.runs)
        assert ln.x2 == max(r.right for r in ln.runs)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=1, max_size=10), min_size=0,
                max_size=20), st.randoms())
def test_extract_doc_offset_shuffle_invariance(lines_words, rnd):
    """The kernel sorts by offset, so the LIST order of raw spans must
    not matter — only the offset values."""
    spans = []
    y = 72.0
    for words in lines_words:
        run = TextRun(1, 72.0, round(y, 2), 11.0, "F", " ".join(words))
        spans.append(("text", wire.encode_text_run(run), "", len(spans)))
        y += 14.0
    shuffled = list(spans)
    rnd.shuffle(shuffled)
    a = [tuple(s) for s in extract_doc(spans)]
    b = [tuple(s) for s in extract_doc(shuffled)]
    assert a == b
    assert [s[3] for s in a] == list(range(len(a)))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ap .!?x\n", max_size=400),
       st.integers(40, 200))
def test_chunk_text_invariants(text, max_len):
    chunks = chunk_text(text, max_len=max_len, overlap=max_len // 4)
    for c in chunks:
        assert 0 < len(c) <= max_len
    # no content loss: every non-space char count is preserved or grown
    # (overlap duplicates); never shrunk
    orig = sum(1 for ch in text if not ch.isspace())
    got = sum(1 for ch in "".join(chunks) if not ch.isspace())
    assert got >= orig - 0  # sentences only drop pure-whitespace units


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="0123456789,-n()+* al", max_size=30),
       st.integers(1, 50))
def test_page_select_never_crashes_and_stays_in_range(spec, total):
    pages = parse_page_selection(spec, total)
    assert len(pages) == len(set(pages))
    assert all(1 <= p <= total for p in pages)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(_WORD, min_size=1, max_size=8), min_size=1,
                max_size=15),
       st.sampled_from([0, 90, 180, 270]))
def test_pagemeta_is_extraction_invariant(lines_words, rotation):
    """Logical rotation state (pagemeta spans) must never change
    extraction output — PDFBox dir-adjusted semantics."""
    spans = []
    y = 72.0
    for words in lines_words:
        run = TextRun(1, 72.0, round(y, 2), 11.0, "F", " ".join(words))
        spans.append(("text", wire.encode_text_run(run), "", len(spans)))
        y += 14.0
    with_meta = spans + [
        ("pagemeta", wire.encode_pagemeta(1, 612.0, 792.0, rotation), "",
         len(spans)),
    ]
    assert [tuple(s) for s in extract_doc(spans)] == \
        [tuple(s) for s in extract_doc(with_meta)]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.floats(1, 600, allow_nan=False),
                          st.floats(1, 780, allow_nan=False)),
                min_size=1, max_size=12))
def test_textfind_matches_cover_extracted_text(points):
    """Searching for a term present in every run finds >= one match per
    run-bearing page, and every bbox is well-formed."""
    from stirling_pdf_spark.kernel.textfind import assemble_page, find_matches

    runs = [TextRun(1, round(x, 2), round(y, 2), 11.0, "F", "needle")
            for x, y in points]
    text, boxes = assemble_page(runs)
    assert text.count("needle") == len(runs)
    matches = find_matches(runs, "needle")
    assert len(matches) == len(runs)
    for m in matches:
        assert m.x2 >= m.x1 and m.y2 >= m.y1 and m.text == "needle"
    # per-char boxes: every non-separator char has one
    assert sum(1 for b in boxes if b is not None) == \
        sum(len(r.content) for r in runs)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from(["t", "div"]), min_size=1, max_size=8))
def test_rule_components_never_lose_rules(pattern):
    """Every rule lands in exactly one component."""
    from stirling_pdf_spark.kernel.tables import Rule, _rule_components

    rules = []
    y = 0.0
    for i, k in enumerate(pattern):
        # alternate separated horizontal rules; 'div' jumps far away
        y += 100.0 if k == "div" else 0.2
        rules.append(Rule(1, 0.0, y, 50.0, y))
    comps = _rule_components(rules)
    assert sum(len(c) for c in comps) == len(rules)
    flat = [r for c in comps for r in c]
    assert sorted(flat) == sorted(rules)
