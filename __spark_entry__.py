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
    toward the weakest external evidence (VERDICT r5 #4, by AGE since
    r9). Round 10 heads the 50 with the seven queries whose
    implementation changed or landed this round: q200/q202/q203 (the
    LM family's context-count join fix, overflow-symmetric fixed-mode
    sums, and the auto-switched '<unk>' mapping in lm_bigram_counts
    feed all three scorers), q204 (new composed winnowing dedup
    capstone), q205 (new exact shared-run pairs), q206 (new
    exact-substring trim) and q207 (new exact-span decontamination).
    Then the stalest direct driver evidence per VERDICT r9 #5:
    q62-q65 (cut in r9, r7-era rows), q48-q50 (r4-era), the q77-q109
    band (r4/r5-era, partially refreshed since), and q110-q120
    (r4-late) to fill the cap: 7 + 4 + 3 + 33 = 47 explicit + the
    first 3 of the q110 band = 50. Changed/new queries sort FIRST so the cap can never
    silently drop a query with zero driver evidence; both committed
    selfcheck sweeps cover the full surface at 2 SFs regardless.
    Every key keeps its name — only dict insertion order changes."""

    changed_r10 = {200, 202, 203, 204, 205, 206, 207}

    def key(name: str):
        n = int(name[1:].split("_", 1)[0])
        if n in changed_r10:
            return (0, n)
        if 62 <= n <= 65:
            return (1, n)
        if 48 <= n <= 50:
            return (2, n)
        if 77 <= n <= 109:
            return (3, n)
        if 110 <= n <= 120:
            return (4, n)
        return (5, n)

    return {k: d[k] for k in sorted(d, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
