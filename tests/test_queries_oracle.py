"""Every declared query vs its DuckDB oracle — the local replica of the
driver's CORRECTNESS gate, run at sf0.001 for speed (the driver uses
sf0.01; set SPARKSYNC_TEST_SF to widen)."""

from __future__ import annotations

import pytest

from sparksync.queries import ORACLES, QUERIES

from .conftest import SF_CORRECT, compare_query_vs_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    compare_query_vs_oracle(spark, duck, QUERIES[name], ORACLES[name], SF_CORRECT)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
