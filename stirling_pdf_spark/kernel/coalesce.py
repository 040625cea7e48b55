"""Glyph-run coalescing into styled text elements (reference op E7).

Reproduces the accumulator semantics of
PdfJsonConversionService.java:5748-5882 (canAppend at 5794-5826) with
the tolerances of :169-171:

  * consecutive runs (STREAM order, i.e. raw offset order — the
    structured path uses the UNSORTED stripper, SURVEY.md §2.1.6.1)
    merge while the style key (font, font_size) matches exactly,
  * AND the baseline differs by <= 0.5 pt (BASELINE_MERGE_TOLERANCE),
  * AND the x-gap to the previous fragment is not a word gap
    (> 0.5 x avg char width would have produced a separate element
    with a space in the text path);
  * merged width = max(sum of fragment widths, endX - startX)
    (:5605-5653);
  * element zOrder = TEXT_Z_BASE + counter per page, images
    IMAGE_Z_BASE + draw counter; mergeDrawables sorts (zOrder, seq) so
    per page all images precede all text (:5174, 5378-5421).

Orientation (textMatrix within 5e-4) always matches in our wire model —
the synthetic corpus has no rotated text; the tolerance constant is
kept in model.py for when a rotation-bearing source lands.
"""

from __future__ import annotations

from typing import NamedTuple

from .model import (
    BASELINE_MERGE_TOLERANCE,
    CHAR_WIDTH_FACTOR,
    WORD_SPACE_FACTOR,
    TextRun,
)


class TextElement(NamedTuple):
    page: int
    x: float
    y: float
    font: str
    font_size: float
    text: str
    width: float
    z_order: int


def _width(run: TextRun) -> float:
    return len(run.content) * CHAR_WIDTH_FACTOR * run.font_size


def coalesce_runs(runs: list[TextRun], z_base: int = 1_000_000) -> list[TextElement]:
    """Coalesce one page's runs (given in stream order) into elements."""
    out: list[TextElement] = []
    if not runs:
        return out
    cur = [runs[0]]
    sum_w = _width(runs[0])

    def flush() -> None:
        first, last = cur[0], cur[-1]
        text = "".join(r.content for r in cur)
        end_x = last.x + _width(last)
        width = max(sum_w, end_x - first.x)
        out.append(TextElement(
            first.page, first.x, first.y, first.font, first.font_size,
            text, width, z_base + len(out),
        ))

    for run in runs[1:]:
        prev = cur[-1]
        style_ok = (run.font == prev.font
                    and run.font_size == prev.font_size)
        baseline_ok = abs(run.y - prev.y) <= BASELINE_MERGE_TOLERANCE
        prev_w = _width(prev)
        avg_cw = (prev_w / len(prev.content)) if prev.content else 0.0
        gap = run.x - (prev.x + prev_w)
        word_gap = gap > WORD_SPACE_FACTOR * avg_cw
        if style_ok and baseline_ok and not word_gap:
            cur.append(run)
            sum_w += _width(run)
        else:
            flush()
            cur = [run]
            sum_w = _width(run)
    flush()
    return out
