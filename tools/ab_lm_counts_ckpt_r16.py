"""Interleaved A/B for the round-16 lm_score_against_model counts
checkpoint: arm OLD disables the eager localCheckpoint (identity), arm
NEW keeps it. One session, alternating arms, (sec, jobs) per run.

The toggle is a module flag consulted nowhere else; we monkeypatch
DataFrame.localCheckpoint only for the counts call site by wrapping
lm_score_against_model's counts argument (OLD arm passes a proxy whose
localCheckpoint returns self).

Usage: PYTHONPATH=. python tools/ab_lm_counts_ckpt_r16.py [--rounds N]
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
    args = ap.parse_args()

    from pyspark.sql import DataFrame

    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-lmckpt-r16")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()
    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    real_ckpt = DataFrame.localCheckpoint

    def no_ckpt(self, eager=True):
        return self

    results = {"old": [], "new": []}
    for rnd in range(args.rounds):
        for arm, fn in (("old", no_ckpt), ("new", real_ckpt)):
            DataFrame.localCheckpoint = fn
            try:
                j0, t0 = n_jobs(), time.time()
                QUERIES["q203_lm_drift"](spark, args.sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                results[arm].append((round(time.time() - t0, 3), n_jobs() - j0))
            finally:
                DataFrame.localCheckpoint = real_ckpt
        print(
            f"# round {rnd}: old={results['old'][-1]} new={results['new'][-1]}",
            flush=True,
        )
    print("== summary (sec, jobs) ==")
    for arm, rows in results.items():
        print(f"{arm}: {rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
