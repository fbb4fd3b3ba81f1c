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
    Round 12 heads the 50 with the queries whose implementation
    or gate changed this round: q28 (asof_join's typed null struct is
    now built from DataType objects and the tie-break falls back to a
    hash surrogate for non-orderable right values — output identical
    on the fixture), q145/q159/q178/q199 (the shared keeper election
    now ranks NULL quality as +inf so it LOSES; fixtures are non-null
    so outputs must be bit-identical), and q208/q209 (their oracles
    now coalesce NULL text to mirror the engine's zero-token
    contract; the shipped fixtures carry no NULL text so outputs are
    unchanged), plus the SEVEN new round-12 capstones: q210 (X206
    per-benchmark contamination coverage), q211 (X207 leakage-safe
    cluster split), q212 (X208 soft dedup, the ceil(sqrt(n))
    downweighting policy), q213 (X209 split-leakage audit, the
    measure twin of q211), q214 (X210 per-doc boilerplate fraction),
    q215 (X211 dedup threshold sweep) and q216 (X212 per-source
    document cap). Then the q155-q193 band (VERDICT r11 #1: the
    oldest third of the surface, last driver-checked r7-r8): 14
    changed/new + the first 36 band keys = 50 — the cap excludes
    q193 (the band's last member, still r7/r8-stale: it heads next
    round's rotation) and the r9/r10-era q194-q196. Changed/new
    queries sort FIRST so the cap can never silently drop a query
    with zero fresh driver evidence; both committed selfcheck sweeps
    cover the full surface at 2 SFs regardless. Every key keeps its
    name — only dict insertion order changes."""

    changed_r12 = {28, 145, 159, 178, 199, 208, 209, 210, 211, 212, 213, 214, 215, 216}

    def key(name: str):
        n = int(name[1:].split("_", 1)[0])
        if n in changed_r12:
            return (0, n)
        if 155 <= n <= 193:
            return (1, n)
        if 194 <= n <= 200:
            return (2, n)
        return (3, n)

    return {k: d[k] for k in sorted(d, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
