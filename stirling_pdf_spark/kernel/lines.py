"""Glyph-run -> visual-line clustering (E5) and line text assembly.

Reproduces the reference's AllTextLineExtractor semantics
(AllTextLineExtractor.java:29-127):
  * whitespace-only glyph runs are skipped (:74-80),
  * runs are processed in (y, x) sorted order,
  * a new line starts when |y - line_y| > 3.0 pt (LINE_Y_TOLERANCE, :32)
    OR the x-gap to the previous run exceeds 14 pt (COLUMN_GAP_X, :39 —
    this is what splits IEEE two-column shared baselines),
and the word-spacing rule of PdfModels.RawLine.text()
(PdfModels.java:59-73): insert a single space when the gap between a
fragment and the previous fragment's right edge exceeds 0.5x the
previous fragment's average character width.
"""

from __future__ import annotations

from operator import attrgetter

from .model import (
    CHAR_WIDTH_FACTOR,
    COLUMN_GAP_X,
    LINE_Y_TOLERANCE,
    WORD_SPACE_FACTOR,
    TextRun,
)


class Line:
    """A visual line with bbox cached incrementally on append — the
    geometry is read many times per line by the column vote and the
    reading-order sort keys (hot path at corpus scale)."""

    __slots__ = ("runs", "y", "x1", "x2", "y1", "y2", "_last_right")

    def __init__(self, runs: list[TextRun]):
        first = runs[0]
        # start from the first run only; the loop below appends the rest
        # exactly once (appending the caller's list wholesale and then
        # re-appending in the loop would duplicate intermediate runs)
        self.runs = [first]
        self.y = first.y
        w = len(first.content) * CHAR_WIDTH_FACTOR * first.font_size
        self.x1 = first.x
        self.x2 = first.x + w
        self.y1 = first.y
        self.y2 = first.y + first.font_size
        self._last_right = self.x2
        for run in runs[1:]:
            self.append(run)

    def append(self, run: TextRun) -> None:
        self.runs.append(run)
        w = len(run.content) * CHAR_WIDTH_FACTOR * run.font_size
        right = run.x + w
        if run.x < self.x1:
            self.x1 = run.x
        if right > self.x2:
            self.x2 = right
        if run.y < self.y1:
            self.y1 = run.y
        if run.y + run.font_size > self.y2:
            self.y2 = run.y + run.font_size
        self._last_right = right

    @property
    def width(self) -> float:
        return self.x2 - self.x1

    @property
    def x_mid(self) -> float:
        return (self.x1 + self.x2) / 2.0

    def text(self) -> str:
        """Fragments in append order; word-space rule per
        PdfModels.java:59-73. Geometry computed locally once per run
        (the property path recomputes width three times per fragment —
        measured hot at corpus scale)."""
        runs = self.runs
        first = runs[0]
        if len(runs) == 1:
            return first.content
        parts = [first.content]
        prev_n = len(first.content)
        prev_w = prev_n * CHAR_WIDTH_FACTOR * first.font_size
        prev_right = first.x + prev_w
        for run in runs[1:]:
            avg_cw = (prev_w / prev_n) if prev_n else 0.0
            if (run.x - prev_right) > WORD_SPACE_FACTOR * avg_cw:
                parts.append(" ")
            parts.append(run.content)
            prev_n = len(run.content)
            prev_w = prev_n * CHAR_WIDTH_FACTOR * run.font_size
            prev_right = run.x + prev_w
        return "".join(parts)


def cluster_lines(runs: list[TextRun]) -> list[Line]:
    """Cluster one page's glyph runs into visual lines.

    Anchor semantics: a line's reference y is the y of its first run —
    the reference compares each incoming TextPosition against the
    running line's anchor, not the previous run (flush logic
    AllTextLineExtractor.java:84-95)."""
    # isspace() instead of strip(): same predicate (non-empty with any
    # non-space char) without allocating a stripped copy per run
    visible = [r for r in runs
               if r.content and not r.content.isspace()]
    visible.sort(key=attrgetter("y", "x"))
    lines: list[Line] = []
    cur: Line | None = None
    for run in visible:
        if cur is None:
            cur = Line([run])
            continue
        y_break = abs(run.y - cur.y) > LINE_Y_TOLERANCE
        x_break = (run.x - cur._last_right) > COLUMN_GAP_X
        if y_break or x_break:
            lines.append(cur)
            cur = Line([run])
        else:
            cur.append(run)
    if cur is not None:
        lines.append(cur)
    return lines
