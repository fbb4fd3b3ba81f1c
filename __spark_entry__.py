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
    surface is len(QUERIES) (227 as of round 14 — test_meta asserts
    the exact count), so allocation is explicit and rotates each round
    toward the weakest external evidence (VERDICT r5 #4, by AGE).

    Round 14 heads the 50 with the round's changed/new queries: q222
    (X218 recipe_mix, NEW — epoch_recipe's allocation executed through
    budget_mix), q223 (X219 closed-form embedding diversity, NEW),
    q224 (X220 MWU domain reweighting, NEW), q225 (X222 deterministic
    training order, NEW), q226 (X223 length-bucket padding audit,
    NEW), q227 (X224 curriculum staging, NEW), q218 (ORACLE_Q218 gained the coalesce NULL-text guard — a
    gate change, so it re-earns driver evidence), q221 (signal_auc
    rewritten one-scan: stack-unpivot + partition_by global_cumsum,
    VERDICT r13 #1) and q219 (ivf_recall divisor is now the per-query
    truth count, ADVICE r13). Then
    strictly by age of last driver check. NOTE — VERDICT r13 #2 named
    q136-q154 as the stalest band, but CORRECTNESS_r11.json shows that
    whole band was driver-checked in round 11; the genuinely stalest
    evidence (the rule VERDICT r5 #4 actually states: by AGE) is the
    round-8-era band q01-q15 + q66-q75 + q197-q198 (27 keys, last
    checked r8), then the oldest of the round-9 band q16-q33 (14 of its 16 keys
    fill the cap; q28 and q32 are excluded — they were re-checked in
    r12/r11 and are fresher than the band around them). Changed/new queries sort FIRST so the cap can never
    silently drop a query with zero fresh driver evidence; both
    committed selfcheck sweeps cover the full surface at 2 SFs
    regardless. Every key keeps its name — only dict insertion order
    changes."""

    changed_r14 = {218, 219, 221, 222, 223, 224, 225, 226, 227}
    r8_era = set(range(1, 16)) | set(range(66, 76)) | {197, 198}

    def key(name: str):
        n = int(name[1:].split("_", 1)[0])
        if n in changed_r14:
            return (0, n)
        if n in r8_era:
            return (1, n)
        if 16 <= n <= 33 and n not in (28, 32):
            return (2, n)
        return (3, n)

    return {k: d[k] for k in sorted(d, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
