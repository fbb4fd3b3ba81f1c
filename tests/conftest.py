"""Shared fixtures: one local Spark session + a DuckDB oracle runner
that replicates the driver's comparison (row count + schema + order-
insensitive value compare with columns sorted by name)."""

from __future__ import annotations

import datetime
import decimal
import os
import time

import duckdb
import pytest

os.environ.setdefault("TZ", "UTC")
time.tzset()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARKSYNC_TEST_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from sparksync.session import get_spark

    s = get_spark("sparksync-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf in {SF_SMOKE, SF_CORRECT}:
        pass
    # one set of views per scale dir is registered on demand in run_oracle
    yield con
    con.close()


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"create or replace view {t} as select * from '{sf_dir}/{t}.parquet'"
        )


def norm_cell(v):
    """Engine-neutral value normalization mirroring a strict value-hash:
    decimals keep their scale (string form), floats compare bit-exact,
    timestamps compare tz-naive."""
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, bool):
        return ("b", v)
    return v


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    # repr as sort key: NULLs and mixed types have no natural order
    out = sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows), key=repr
    )
    return [columns[i] for i in order], out


def compare_query_vs_oracle(spark, con, spark_fn, sql, sf_dir):
    """The local replica of the driver's CORRECTNESS gate."""
    df = spark_fn(spark, sf_dir)
    s_cols = [c.lower() for c in df.columns]
    s_rows = [tuple(r) for r in df.collect()]
    register_views(con, sf_dir)
    res = con.execute(sql)
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    sc, sm = rows_to_multiset(s_cols, s_rows)
    dc, dm = rows_to_multiset(d_cols, d_rows)
    assert len(sm) == len(dm), f"row count: spark={len(sm)} duck={len(dm)}"
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        raise AssertionError(f"value mismatch (first diffs sorted): {diffs}")
