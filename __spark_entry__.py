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
    """The driver's CORRECTNESS report samples at most 50 queries; round
    3's report covered q01-q50 and left q51+ with no hard driver
    signal (VERDICT r3 #7). Register the ported surface (q01-q17)
    first, then THIS round's additions (q77+), then the q51-q76 block
    the driver has never sampled, then the rest — a positional cap
    covers everything new plus most of the unsampled block (q01-q17 +
    q77-q86 + 23 of q51-q76 = 50). The full sweep is still committed
    per round as tools/selfcheck_r{N}.log, and every key keeps its
    name — only dict insertion order changes."""

    def block(name: str) -> int:
        n = int(name[1:].split("_", 1)[0])
        if n <= 17:
            return 0
        if n >= 77:
            return 1
        if n >= 51:
            return 2
        return 3

    return {k: d[k] for k in sorted(d, key=lambda k: (block(k), k))}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLES)
