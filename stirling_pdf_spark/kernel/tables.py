"""Lattice table extraction (reference op E14).

The reference extracts tables with Tabula's LATTICE mode — ruled lines
define a cell grid, text falls into cells, CSV comes out with the
Excel quote-all dialect (TabulaTableParser.java:53-110 mode selection,
PdfContentExtractor.java:110-129 CSV; no colspans, no headers, no
cross-page tables). This reimplements the lattice semantics from that
spec over our wire model:

  * ruled lines arrive as kind='rule' raw spans,
    wire text "{page}|{x1}|{y1}|{x2}|{y2}" — horizontal when y1 == y2,
    vertical when x1 == x2 (other segments ignored, as lattice does);
  * a page with >= 2 horizontal and >= 2 vertical rules yields ONE
    table whose grid is the cross product of the sorted distinct rule
    coordinates (the single-lattice simplification — multi-table pages
    merge into one grid, documented limitation);
  * a glyph run belongs to cell (r, c) when its anchor point lies in
    [x_c, x_{c+1}) x [y_r, y_{r+1}); cell text joins its runs in (y, x)
    order with single spaces;
  * output CSV quotes every field (quote-all), rows joined by newline,
    embedded quotes doubled.
"""

from __future__ import annotations

from typing import NamedTuple

from .model import TextRun


class Rule(NamedTuple):
    page: int
    x1: float
    y1: float
    x2: float
    y2: float


def parse_rule(text: str) -> Rule:
    p, x1, y1, x2, y2 = text.split("|", 4)
    return Rule(int(p), float(x1), float(y1), float(x2), float(y2))


def encode_rule(rule: Rule) -> str:
    return (f"{rule.page}|{rule.x1!r}|{rule.y1!r}"
            f"|{rule.x2!r}|{rule.y2!r}")


def _csv_field(s: str) -> str:
    return '"' + s.replace('"', '""') + '"'


def extract_table_csv(rules: list[Rule], runs: list[TextRun]) -> str | None:
    """One page's rules + glyph runs -> CSV, or None when no lattice."""
    hs = sorted({r.y1 for r in rules if r.y1 == r.y2})
    vs = sorted({r.x1 for r in rules if r.x1 == r.x2})
    if len(hs) < 2 or len(vs) < 2:
        return None
    n_rows, n_cols = len(hs) - 1, len(vs) - 1
    cells: list[list[list[TextRun]]] = [
        [[] for _ in range(n_cols)] for _ in range(n_rows)
    ]
    for run in sorted(runs, key=lambda t: (t.y, t.x)):
        if not run.content.strip():
            continue
        r = c = None
        for i in range(n_rows):
            if hs[i] <= run.y < hs[i + 1]:
                r = i
                break
        for j in range(n_cols):
            if vs[j] <= run.x < vs[j + 1]:
                c = j
                break
        if r is not None and c is not None:
            cells[r][c].append(run)
    lines = []
    for row in cells:
        fields = [" ".join(t.content for t in cell) for cell in row]
        lines.append(",".join(_csv_field(f) for f in fields))
    return "\n".join(lines)
