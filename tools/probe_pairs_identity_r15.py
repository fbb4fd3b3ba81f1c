"""Round-15 diagnostic: is the pair-graph plan IDENTICAL across two
invocations of the same query builder? If not, pinning it can never
reuse across the bench's median-of-3 runs — each run inserts a fresh
cache entry (columnar encode cost, no reuse, FIFO churn), which is
exactly the q199 pin regression mechanism the A/B measured.

Prints, per query family: the pair plan's semanticHash for two builds,
whether they match, and whether the second _pin call found an existing
cache entry.

Usage: python tools/probe_pairs_identity_r15.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F  # noqa: F401

    from sparksync.ext import dedup, features
    from sparksync.queries import QUERIES  # noqa: F401
    from sparksync.session import get_spark

    spark = get_spark("probe-pairs-identity-r15")
    spark.sparkContext.setLogLevel("ERROR")

    def load(table):
        return spark.read.parquet(f"{sf_dir}/{table}.parquet")

    docs = load("documents")

    def pair_builders():
        yield (
            "q199 minhash_dedup_pairs",
            lambda: dedup.minhash_dedup_pairs(docs).select("d1", "d2"),
        )
        yield (
            "q204 winnow_overlap_pairs",
            lambda: dedup.winnow_overlap_pairs(
                docs, k=5, w=8, min_shared=3
            ).select("d1", "d2"),
        )

    for name, build in pair_builders():
        features.release_pinned()
        spark.catalog.clearCache()
        a = build()
        b = build()
        ha = a._jdf.queryExecution().analyzed().semanticHash()
        hb = b._jdf.queryExecution().analyzed().semanticHash()
        # does pinning a then looking up b hit the same cache entry?
        pa = features._pin(a)
        pa.count()
        hit = features._cached_data(b) is not None
        print(
            f"{name}: semanticHash a={ha} b={hb} "
            f"match={ha == hb} second_build_cache_hit={hit}",
            flush=True,
        )
        features.release_pinned()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
