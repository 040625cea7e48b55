"""Page-select DSL semantics (reference F7, GeneralUtils.java:636-830
per SURVEY.md §2.4): ranges, n-expressions with implicit
multiplication, order-preserving dedup, caps."""

from __future__ import annotations

from stirling_pdf_spark.functions.page_select import parse_page_selection


def test_all():
    assert parse_page_selection("all", 4) == [1, 2, 3, 4]


def test_comma_list_and_dedup_order():
    assert parse_page_selection("3,1,3,2", 5) == [3, 1, 2]


def test_ranges():
    assert parse_page_selection("2-4", 10) == [2, 3, 4]
    assert parse_page_selection("8-", 10) == [8, 9, 10]
    assert parse_page_selection("9-20", 10) == [9, 10]  # clipped to total


def test_n_expressions():
    assert parse_page_selection("2n+1", 7) == [3, 5, 7]
    assert parse_page_selection("3n", 10) == [3, 6, 9]
    assert parse_page_selection("n(n-1)", 10) == [2, 6]  # 1*0 dropped, 2*1, 3*2
    assert parse_page_selection("n", 3) == [1, 2, 3]


def test_mixed_parts():
    assert parse_page_selection("1,3,5-7,n(n-1)", 10) == [1, 3, 5, 6, 7, 2]


def test_out_of_range_and_garbage():
    assert parse_page_selection("0,99,-3", 5) == []
    assert parse_page_selection("import os", 5) == []
    # Pow is rejected outright (unbounded-compute DoS guard — the
    # reference DSL only supports +-*/, GeneralUtils.java:735-795)
    assert parse_page_selection("n**n", 3) == []
    assert parse_page_selection("9**9**9**9", 3) == []


def test_cap():
    # cap = max(1000, 3*total); "all" repeated can't exceed distinct total
    pages = parse_page_selection(",".join(["all"] * 5), 400)
    assert pages == list(range(1, 401))
