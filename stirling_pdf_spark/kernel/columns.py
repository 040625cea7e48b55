"""Column-layout detection (E6) and reading order.

Midpoint vote per PageColumnLayout.java:23-43,65-89:
  * only lines at least 100 pt wide vote (MIN_COLUMN_LINE_WIDTH),
  * a line votes LEFT when its x-midpoint < page_mid - 30 (GUTTER_SLACK),
    RIGHT when x-midpoint > page_mid + 30,
  * the page is two-column iff both sides collect >= 3 votes
    (MIN_SIDE_LINES).

Reading order (the XY-cut analogue, SURVEY.md §2.1.6.3):
  * single-column page: (y, x) order;
  * two-column page: full-width lines (spanning the gutter, classified
    like PageColumnLayout.columnsCrossing :109-141) cut the page into
    horizontal bands; within a band the left column reads top-down,
    then the right column — i.e. sort key
    (band, 0 if full-width else 1, column, y, x).
"""

from __future__ import annotations

from .model import GUTTER_SLACK, MIN_COLUMN_LINE_WIDTH, MIN_SIDE_LINES, PAGE_WIDTH
from .lines import Line


def is_two_column(lines: list[Line], page_width: float = PAGE_WIDTH) -> bool:
    mid = page_width / 2.0
    left = right = 0
    for ln in lines:
        if ln.width < MIN_COLUMN_LINE_WIDTH:
            continue
        xm = ln.x_mid
        if xm < mid - GUTTER_SLACK:
            left += 1
        elif xm > mid + GUTTER_SLACK:
            right += 1
    return left >= MIN_SIDE_LINES and right >= MIN_SIDE_LINES


def _is_full_width(ln: Line, mid: float) -> bool:
    return ln.x1 < mid - GUTTER_SLACK and ln.x2 > mid + GUTTER_SLACK


def reading_order(lines: list[Line], page_width: float = PAGE_WIDTH) -> list[Line]:
    if not is_two_column(lines, page_width):
        return sorted(lines, key=lambda ln: (ln.y, ln.x1))
    mid = page_width / 2.0
    by_y = sorted(lines, key=lambda ln: (ln.y, ln.x1))
    keyed = []
    band = 0
    for ln in by_y:
        fw = _is_full_width(ln, mid)
        col = 0 if ln.x_mid < mid else 1
        if fw:
            # full-width line heads its own band boundary: it reads
            # before the columns below it
            band += 1
            keyed.append(((band, 0, 0, ln.y, ln.x1), ln))
        else:
            keyed.append(((band, 1, col, ln.y, ln.x1), ln))
    keyed.sort(key=lambda kv: kv[0])
    return [ln for _, ln in keyed]
