"""Local replica of the driver's CORRECTNESS gate, run against a
deliberately *vanilla* SparkSession (none of sparksync.session's confs)
so any hidden dependency on our own session builder shows up here, not
in the round report.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from __spark_entry__ import oracle_sql, queries  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(df_pandas) -> str:
    cols = sorted(df_pandas.columns)
    d = df_pandas[cols]
    rows = sorted(
        (tuple(_norm(v) for v in row) for row in d.itertuples(index=False, name=None)),
        key=repr,
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def _norm(v):
    import datetime
    import decimal
    import math

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    # Decimal is deliberately NOT normalized to float: the driver's hash
    # distinguishes Decimal('1.00') from float 1.0, and this replica must be
    # at least as strict (a Decimal-emitting query hash-fails at the driver).
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, (np.floating, float)):
        return ("f", float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.to_pydatetime().replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", v.isoformat() + "T00:00:00")
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def _decimal_columns(df_pandas) -> list:
    import decimal

    out = []
    for c in df_pandas.columns:
        col = df_pandas[c].dropna()
        if len(col) and isinstance(col.iloc[0], decimal.Decimal):
            out.append(c)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck-vanilla")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create or replace view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = queries(), oracle_sql()
    report, fails = {}, []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        row: dict = {}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            sdf.columns = [c.lower() for c in sdf.columns]
            row["spark_rows"] = len(sdf)
            dec_cols = _decimal_columns(sdf)
            if dec_cols:
                # Decimal-typed outputs hash-differently from DuckDB's float64
                # bridge at the driver; flag them loudly even when values match.
                row["decimal_cols"] = dec_cols
                fails.append(name)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                ddf.columns = [c.lower() for c in ddf.columns]
                row["oracle_rows"] = len(ddf)
                row["rows_match"] = len(sdf) == len(ddf)
                row["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                row["hash_match"] = value_hash(sdf) == value_hash(ddf)
                if not all(
                    (row["rows_match"], row["schema_match"], row["hash_match"])
                ):
                    fails.append(name)
            else:
                row["oracle"] = "none"
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            fails.append(name)
        report[name] = row
        status = "FAIL" if name in fails else "ok"
        print(f"{status:4s} {name}: {json.dumps(row, default=str)[:160]}")
    print(f"\n{len(report) - len(fails)}/{len(report)} green; fails: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
