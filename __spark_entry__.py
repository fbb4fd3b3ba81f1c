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
    surface is len(QUERIES) (207 as of round 10 — test_meta asserts
    the exact count), so allocation is explicit and rotates each round
    toward the weakest external evidence (VERDICT r5 #4, by AGE).
    Round 11 heads the 50 with the eight queries whose implementation
    or gate changed this round: q48 (re-gated from rows-only native
    HLL++ to the oracle-checked portable m=64 sketch, VERDICT r10 #5),
    q32 and q178 (now pin n_planes=32 explicitly while the production
    default auto-sizes, VERDICT r10 #1 — outputs must be bit-identical
    to r10), q205/q206/q207 (oracles now mirror the engine's
    max_gram_freq=64 degenerate-doc cap, ADVICE r10 #1 — outputs
    unchanged on non-degenerate fixtures), q208 (NEW: decontamination
    trim, the removal half of q207) and q209 (NEW: within-doc
    exact-substring trim, the act twin of q54's repetition measure).
    Then q141 FIRST among the stale (ten rounds with zero green driver
    evidence — its only CORRECTNESS row is a long-fixed round-4
    harness error; VERDICT r10 #2 names it explicitly), then the
    FULL q113-q152 band — 40 queries, containing the 33 whose newest
    driver evidence is r4 — then q153+ (r7-era) to fill the cap:
    8 changed + q141 + 39 (the band minus q141) = 48, + q153-q154
    = 50. Changed/new queries sort FIRST so the cap can never
    silently drop a query with zero driver evidence; both committed
    selfcheck sweeps cover the full surface at 2 SFs regardless.
    Every key keeps its name — only dict insertion order changes."""

    changed_r11 = {48, 32, 178, 205, 206, 207, 208, 209}

    def key(name: str):
        n = int(name[1:].split("_", 1)[0])
        if n in changed_r11:
            return (0, n)
        if n == 141:
            return (1, n)
        if 113 <= n <= 152:
            return (2, n)
        if 153 <= n <= 187:
            return (3, n)
        return (4, n)

    return {k: d[k] for k in sorted(d, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
