"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001
queries()     -> every implemented operator (SURVEY.md section 2 + ext)
oracle_sql()  -> DuckDB-equivalent SQL per query (correctness gate)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparksync.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def _rotated(d: dict) -> dict:
    """The driver's CORRECTNESS report samples at most 50 queries; the
    surface is len(QUERIES) (221 as of round 13 — test_meta asserts
    the exact count), so allocation is explicit and rotates each round
    toward the weakest external evidence (VERDICT r5 #4, by AGE).
    Round 13 heads the 50 with the queries whose implementation or
    gate changed this round: the FIVE new capstones q217 (X213
    filter attrition waterfall), q218 (X214 token-budget epoch
    recipe), q219 (X215 IVF recall audit), q220 (X216 packing-efficiency sweep) and q221 (X217 signal-AUC audit); q76 (normalize_by_group
    moved to try_sum/try_multiply/try_subtract so the decimal-38
    ceiling NULLs under ANSI instead of throwing — fixture outputs
    identical); q213 (split_leakage_audit left-joins the split map
    with a '(missing)' sentinel — full-coverage gate output
    identical); and q206/q208/q209 (the trim family gained the
    optional pass_stats hook — default None, output identical). Then
    exactly what VERDICT r12 #1 ordered: q193 (the stalest driver
    evidence, cut from r12's cap), q194-q196 (r9/r10-era), then the
    oldest of the q100-q154 band (last driver-checked r6-r7) — the 10
    changed/new + q193-q196 + the first 36 band keys = 50. Changed/new queries sort FIRST so the cap can never
    silently drop a query with zero fresh driver evidence; both
    committed selfcheck sweeps cover the full surface at 2 SFs
    regardless. Every key keeps its name — only dict insertion order
    changes."""

    changed_r13 = {76, 206, 208, 209, 213, 217, 218, 219, 220, 221}

    def key(name: str):
        n = int(name[1:].split("_", 1)[0])
        if n in changed_r13:
            return (0, n)
        if n in (193, 194, 195, 196):
            return (1, n)
        if 100 <= n <= 154:
            return (2, n)
        return (3, n)

    return {k: d[k] for k in sorted(d, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
