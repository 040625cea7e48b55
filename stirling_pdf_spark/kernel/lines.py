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

from dataclasses import dataclass, field

from .model import (
    COLUMN_GAP_X,
    LINE_Y_TOLERANCE,
    WORD_SPACE_FACTOR,
    TextRun,
)


@dataclass
class Line:
    runs: list[TextRun] = field(default_factory=list)

    @property
    def y(self) -> float:
        return self.runs[0].y

    @property
    def x1(self) -> float:
        return min(r.x for r in self.runs)

    @property
    def x2(self) -> float:
        return max(r.right for r in self.runs)

    @property
    def y1(self) -> float:
        return min(r.y for r in self.runs)

    @property
    def y2(self) -> float:
        return max(r.y + r.font_size for r in self.runs)

    @property
    def width(self) -> float:
        return self.x2 - self.x1

    @property
    def x_mid(self) -> float:
        return (self.x1 + self.x2) / 2.0

    def text(self) -> str:
        """Fragments in append order; word-space rule per
        PdfModels.java:59-73."""
        parts: list[str] = []
        prev: TextRun | None = None
        for run in self.runs:
            if prev is not None:
                gap = run.x - prev.right
                if gap > WORD_SPACE_FACTOR * prev.avg_char_width:
                    parts.append(" ")
            parts.append(run.content)
            prev = run
        return "".join(parts)


def cluster_lines(runs: list[TextRun]) -> list[Line]:
    """Cluster one page's glyph runs into visual lines.

    Anchor semantics: a line's reference y is the y of its first run —
    the reference compares each incoming TextPosition against the
    running line's anchor, not the previous run (flush logic
    AllTextLineExtractor.java:84-95)."""
    visible = [r for r in runs if r.content.strip()]
    visible.sort(key=lambda r: (r.y, r.x))
    lines: list[Line] = []
    cur: Line | None = None
    for run in visible:
        if cur is None:
            cur = Line([run])
            continue
        y_break = abs(run.y - cur.y) > LINE_Y_TOLERANCE
        x_break = (run.x - cur.runs[-1].right) > COLUMN_GAP_X
        if y_break or x_break:
            lines.append(cur)
            cur = Line([run])
        else:
            cur.runs.append(run)
    if cur is not None:
        lines.append(cur)
    return lines
