"""Interleaved QUERY-LEVEL A/B for the round-16 `_assign` fold rewrite:
arm A monkeypatches the r15 row_number-window form back in, arm B is
the committed fold form; arms alternate inside one session (guide §1).
Reports per-run (sec, jobs).

Usage: PYTHONPATH=. python tools/ab_assign_queries_r16.py [--sf-dir DIR]
           [--rounds N] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import DataFrame, Window
    from pyspark.sql import functions as F

    from sparksync.ext import similarity as sim
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    new_assign = sim._assign

    def old_assign(e: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
        scored = e.crossJoin(F.broadcast(cent)).select(
            F.col(id_col),
            F.col("cid"),
            sim.cosine(F.col("v"), F.col("cv")).alias("cos"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col(id_col), F.col("cid").alias("centroid_id"))
        )

    spark = get_spark("ab-assign-q-r16")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()
    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    names = args.queries or ["q219_ivf_recall", "q233_ivf_pq"]
    results: dict[str, dict[str, list]] = {n: {"old": [], "new": []} for n in names}
    for rnd in range(args.rounds):
        for name in names:
            for arm, fn in (("old", old_assign), ("new", new_assign)):
                sim._assign = fn
                try:
                    j0, t0 = n_jobs(), time.time()
                    QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    results[name][arm].append(
                        (round(time.time() - t0, 3), n_jobs() - j0)
                    )
                finally:
                    sim._assign = new_assign
        print(
            f"# round {rnd}: "
            + " ".join(
                f"{n}[old={results[n]['old'][-1]} new={results[n]['new'][-1]}]"
                for n in names
            ),
            flush=True,
        )
    print("== summary (sec, jobs) ==")
    for name in names:
        print(f"{name} old: {results[name]['old']}")
        print(f"{name} new: {results[name]['new']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
