"""Page-plan math (cmd/root.go:320-335) incl. the empty-table probe
semantics (cmd/root.go:250-252), plus a property test: pages cover each
row exactly once — SURVEY section 5 items 1 and 4."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sparksync.source import plan_pages


def test_page_math_basic():
    p = plan_pages(250_000, "t", 100_000)
    assert p.num_pages == 3
    assert p.windows() == [(1, 100_000), (100_001, 200_000), (200_001, 250_000)]
    assert p.rownum_predicates()[0] == "rn >= 1 and rn <= 100000"


def test_page_math_exact_multiple():
    p = plan_pages(200_000, "t", 100_000)
    assert p.num_pages == 2
    assert p.windows()[-1] == (100_001, 200_000)


def test_empty_table_still_gets_one_page():
    # the reference forces a `where 1=0` probe for empty tables so DDL
    # still runs (cmd/root.go:250-252); we keep one (empty) page
    p = plan_pages(0, "t", 100_000)
    assert p.num_pages == 1


@settings(deadline=None, max_examples=50)
@given(
    n=st.integers(min_value=0, max_value=1_000_000),
    page=st.integers(min_value=100, max_value=200_000),
)
def test_pages_cover_each_row_exactly_once(n, page):
    p = plan_pages(n, "t", page)
    covered = 0
    prev_hi = 0
    for lo, hi in p.windows():
        if n == 0:
            continue
        assert lo == prev_hi + 1
        assert hi >= lo or n == 0
        covered += hi - lo + 1
        prev_hi = hi
    if n > 0:
        assert covered == n
        assert prev_hi == n
