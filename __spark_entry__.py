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
    surface is len(QUERIES) (234 as of round 15 — test_meta asserts
    the exact count), so allocation is explicit and rotates each round
    toward the weakest external evidence (VERDICT r5 #4, by AGE).

    Round 15 heads the 50 with the round's changed/new queries: q228
    (X226 full BPE trainer loop, NEW), q229 (X227 composed curriculum
    loader order, NEW), q230 (X228 BPE apply/segment, NEW), q231 +
    q232 (X229/X230 product quantization encode + ADC read path, NEW),
    q233 + q234 (X231/X232 composed IVF-PQ search + PQ recall audit,
    NEW),
    q227 +
    q111 + q151 (ntile_from_rank's
    arithmetic changed — remainder-subtracted exact divisions replace
    the decimal(38,6)-rounded form, ADVICE r14 — so every consumer
    re-earns driver evidence), and q221 (signal_auc gained backslash
    escaping + duplicate-signal rejection, ADVICE r14). Then strictly
    by age of last driver check, computed from the CORRECTNESS_r*.json
    history: ALL 28 keys last checked in round 9 (q31, q33-q47,
    q51-q61, q201), then the 11 lowest-numbered of the 33 keys last
    checked in round 10 (q49, q50, q62-q65, q77-q81) to fill the cap
    — exactly VERDICT r14 #1's prescription. Changed/new queries sort
    FIRST so the cap can never silently drop a query with zero fresh
    driver evidence; both committed selfcheck sweeps cover the full
    surface at 2 SFs regardless. Every key keeps its name — only dict
    insertion order changes."""

    changed_r15 = {228, 229, 230, 231, 232, 233, 234, 227, 111, 151, 221}
    r9_era = {31, 201} | set(range(33, 48)) | set(range(51, 62))
    r10_oldest = {49, 50, 62, 63, 64, 65} | set(range(77, 82))

    def key(name: str):
        n = int(name[1:].split("_", 1)[0])
        if n in changed_r15:
            return (0, n)
        if n in r9_era:
            return (1, n)
        if n in r10_oldest:
            return (2, n)
        return (3, n)

    return {k: d[k] for k in sorted(d, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
