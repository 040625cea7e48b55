"""Positional page text search (reference op E13, TextFinder.java:21-193).

The reference accumulates per-page text alongside a parallel
TextPosition list in which INSERTED separators (line breaks, word
spaces the stripper synthesizes) hold null positions. A match's bbox is
the union of its member glyph boxes (:115-137); when every character of
a match lands on separator nulls, a nearby-position fallback scans
±5 characters around the match and takes the FIRST real glyph box
(:139-158, note the break — one glyph, not a union).

This module reproduces that accumulation over our glyph-run model: the
page text is assembled exactly like the extraction kernel's reading
order (cluster_lines + reading_order + the RawLine word-space rule), so
search offsets line up with extracted text. Geometry stays in screen
space (y down, box = [x, y, x+w, y+font_size]).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .columns import reading_order
from .lines import cluster_lines
from .model import CHAR_WIDTH_FACTOR, WORD_SPACE_FACTOR, TextRun


class PageMatch(NamedTuple):
    x1: float
    y1: float
    x2: float
    y2: float
    text: str


def assemble_page(runs: list[TextRun]) -> tuple[str, list]:
    """One page's runs -> (page_text, per-char glyph boxes with None at
    inserted separators). Text equals the extraction output joined by
    newlines (same clustering/order/word-space code paths)."""
    chars: list[str] = []
    boxes: list = []
    lines = reading_order(cluster_lines(runs))
    for li, line in enumerate(lines):
        if li:
            chars.append("\n")
            boxes.append(None)
        prev_n = 0
        prev_w = 0.0
        prev_right = None
        for run in line.runs:
            n = len(run.content)
            w = n * CHAR_WIDTH_FACTOR * run.font_size
            if prev_right is not None:
                avg_cw = (prev_w / prev_n) if prev_n else 0.0
                if (run.x - prev_right) > WORD_SPACE_FACTOR * avg_cw:
                    chars.append(" ")
                    boxes.append(None)
            cw = CHAR_WIDTH_FACTOR * run.font_size
            for j, ch in enumerate(run.content):
                chars.append(ch)
                boxes.append((run.x + j * cw, run.y,
                              run.x + (j + 1) * cw, run.y + run.font_size))
            prev_n, prev_w, prev_right = n, w, run.x + w
    return "".join(chars), boxes


def build_pattern(term: str, regex: bool = False,
                  whole_word: bool = False) -> str:
    """TextFinder.java:73-88: the term is trimmed; literal terms are
    quoted. Whole-word mode brackets with \\b EXCEPT for 1-character
    terms, which get explicit lookarounds (``\\b`` fires at the digit
    boundary inside "3.5", so searching "5" would wrongly match there):

    - 1-char digit: ``(?<![\\w])(?<!\\d[.,])X(?![\\w])(?![.,]\\d)``
      ("5" must not match inside "3.5" or "5,7")
    - 1-char other: ``(?<![\\w])X(?![\\w])``
    - else:         ``\\bX\\b``
    """
    term = term.strip()
    pat = term if regex else re.escape(term)
    if whole_word:
        if len(term) == 1 and term.isdigit():
            pat = rf"(?<![\w])(?<!\d[.,])(?:{pat})(?![\w])(?![.,]\d)"
        elif len(term) == 1:
            pat = rf"(?<![\w])(?:{pat})(?![\w])"
        else:
            pat = rf"\b(?:{pat})\b"
    return pat


def find_matches(runs: list[TextRun], term: str, regex: bool = False,
                 whole_word: bool = False) -> list[PageMatch]:
    """All matches on one page with glyph-union bboxes and the ±5
    nearby-position fallback for separator-only matches. An
    all-whitespace term is skipped entirely (TextFinder.java:73-77
    returns early after trim)."""
    if not term.strip():
        return []
    text, boxes = assemble_page(runs)
    out: list[PageMatch] = []
    for m in re.finditer(build_pattern(term, regex, whole_word), text):
        s, e = m.start(), m.end()
        sel = [b for b in boxes[s:e] if b is not None]
        if not sel and s < len(boxes):
            # nearby fallback: first real glyph in [s-5, e+5), then stop
            for i in range(max(0, s - 5), min(len(boxes), e + 5)):
                if boxes[i] is not None:
                    sel = [boxes[i]]
                    break
        if sel:
            out.append(PageMatch(
                min(b[0] for b in sel), min(b[1] for b in sel),
                max(b[2] for b in sel), max(b[3] for b in sel),
                m.group(),
            ))
    return out
