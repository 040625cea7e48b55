"""Hand-computed goldens for column layout + reading order (E6)."""

from stirling_pdf_spark.kernel.columns import is_two_column, reading_order
from stirling_pdf_spark.kernel.lines import Line
from stirling_pdf_spark.kernel.model import TextRun

FS = 10.0  # char width 5.0


def line(x, y, n_chars, tag):
    return Line([TextRun(1, x, y, FS, "F", tag * n_chars)])


def test_two_column_vote():
    # page mid = 306; left lines x 72..172 (mid 122 < 276), right
    # x 352..452 (mid 402 > 336); 20 chars -> width 100 (>= 100 votes)
    left = [line(72.0, 72.0 + 14 * i, 20, "l") for i in range(3)]
    right = [line(352.0, 72.0 + 14 * i, 20, "r") for i in range(3)]
    assert is_two_column(left + right)
    # only 2 per side -> not two-column
    assert not is_two_column(left[:2] + right[:2])
    # narrow lines (< 100 pt) don't vote
    narrow_l = [line(72.0, 72.0 + 14 * i, 10, "l") for i in range(3)]
    assert not is_two_column(narrow_l + right)


def test_reading_order_column_major():
    lines = []
    for i in range(3):
        lines.append(line(352.0, 72.0 + 14 * i, 20, "R"))  # right col first in stream
        lines.append(line(72.0, 72.0 + 14 * i, 20, "L"))
    ordered = reading_order(lines)
    texts = ["".join(set(ln.text())) for ln in ordered]
    assert texts == ["L", "L", "L", "R", "R", "R"]


def test_full_width_title_heads_band():
    title = line(100.0, 40.0, 60, "T")  # 300 pt wide, crosses 276..336
    cols = []
    for i in range(3):
        cols.append(line(72.0, 100.0 + 14 * i, 20, "L"))
        cols.append(line(352.0, 100.0 + 14 * i, 20, "R"))
    ordered = reading_order([cols[0], title] + cols[1:])
    kinds = ["".join(set(ln.text())) for ln in ordered]
    assert kinds == ["T", "L", "L", "L", "R", "R", "R"]


def test_single_column_y_then_x():
    lines = [line(72.0, 100.0, 30, "b"), line(72.0, 72.0, 30, "a")]
    ordered = reading_order(lines)
    assert ["".join(set(ln.text())) for ln in ordered] == ["a", "b"]
