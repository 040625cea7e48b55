"""kernel/html_tables.py documented-subset semantics + the Spark
operators built on it (html_table_cells, feed_entries)."""

from __future__ import annotations

from stirling_pdf_spark.kernel.html_tables import extract_table_cells


def test_basic_grid_with_header():
    cells = extract_table_cells(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>")
    assert cells == [
        (0, 0, 0, True, 1, "a"), (0, 0, 1, True, 1, "b"),
        (0, 1, 0, False, 1, "1"), (0, 1, 1, False, 1, "2")]


def test_colspan_advances_cursor_and_invalid_colspan():
    cells = extract_table_cells(
        '<table><tr><td colspan="2">w</td><td>x</td></tr>'
        '<tr><td colspan="zero">y</td><td>z</td></tr></table>')
    assert cells == [
        (0, 0, 0, False, 2, "w"), (0, 0, 2, False, 1, "x"),
        (0, 1, 0, False, 1, "y"), (0, 1, 1, False, 1, "z")]


def test_nested_table_binds_to_innermost():
    cells = extract_table_cells(
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        "</td><td>after</td></tr></table>")
    # the outer cell's text closes when the inner table opens
    assert (0, 0, 0, False, 1, "outer") in cells
    assert (1, 0, 0, False, 1, "inner") in cells
    # after the inner table closes, the NEXT cell continues the outer row
    assert (0, 0, 1, False, 1, "after") in cells


def test_implicit_row_and_whitespace_normalization():
    cells = extract_table_cells(
        "<table><td>  a \n  b </td><td>c<b>d</b>e</td></table>")
    assert cells == [
        (0, 0, 0, False, 1, "a b"), (0, 0, 1, False, 1, "cde")]


def test_unclosed_cells_flush():
    cells = extract_table_cells("<table><tr><td>open")
    assert cells == [(0, 0, 0, False, 1, "open")]


def test_text_outside_tables_ignored():
    assert extract_table_cells("<p>no tables here</p>") == []
    assert extract_table_cells("") == []


def test_html_table_cells_spark(spark):
    from stirling_pdf_spark.functions.html import html_table_cells

    df = spark.createDataFrame(
        [("d1", "<table><tr><td>x</td><td>y</td></tr></table>")],
        ["doc_id", "html"])
    rows = sorted(html_table_cells(df).collect(),
                  key=lambda r: r["col_idx"])
    assert [(r["id"], r["row_idx"], r["col_idx"], r["cell_text"])
            for r in rows] == [("d1", 0, 0, "x"), ("d1", 0, 1, "y")]


def test_feed_entries_spark(spark):
    from stirling_pdf_spark.functions.html import feed_entries

    xml = ("<item><title>t0</title><link>u0</link>"
           "<pubDate>p0</pubDate></item>"
           "<item><title>no link drops</title></item>"
           "<item><link>u2</link></item>")
    df = spark.createDataFrame([("ex.com", xml)],
                               ["domain", "feed_xml"])
    rows = sorted(feed_entries(df).collect(), key=lambda r: r["pos"])
    assert [(r["pos"], r["title"], r["link"], r["pub_date"])
            for r in rows] == [(0, "t0", "u0", "p0"), (2, None, "u2", None)]
