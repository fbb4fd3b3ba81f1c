"""Round-15 fixed-cost profiler: per-query Spark JOB COUNT and wall
time for a cold run and two warm runs in one session (the bench's
median-of-3 shape). Job count is read from the status tracker's job-id
high-water mark, so eager sub-jobs (pins, checkpoints, collect probes,
iterative loops) are all counted — at bench SF the dedup band is
fixed-cost dominated, so jobs-per-run is the number to shrink
(guide §1.2).

Usage: python tools/probe_jobs_r15.py [--sf-dir DIR] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("probe-jobs-r15")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    names = args.queries or ["q199_dedup_report"]
    out = {}
    for name in names:
        runs = []
        for i in range(3):
            j0, t0 = n_jobs(), time.time()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(
                {"sec": round(time.time() - t0, 3), "jobs": n_jobs() - j0}
            )
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
