"""Round-16 fixed-cost profiler: like tools/probe_jobs_r15.py (per-run
Spark JOB COUNT from the status tracker's job-id high-water mark) but
additionally prints each job's stage names for the LAST run, so the
per-job attribution (which checkpoint / collect / broadcast build owns
each driver round-trip) is read from the tracker instead of guessed.

Usage: python tools/probe_jobs_r16.py [--sf-dir DIR] [--runs N] [query ...]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("probe-jobs-r16")
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
        j0 = 0
        for i in range(args.runs):
            j0, t0 = n_jobs(), time.time()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(
                {"sec": round(time.time() - t0, 3), "jobs": n_jobs() - j0}
            )
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr, flush=True)
        # attribute the LAST run's jobs by their stages' names
        for jid in range(j0, n_jobs()):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            stages = []
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    stages.append(f"{sid}:{si.name.splitlines()[0][:60]}")
            print(f"#   job {jid}: {stages}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
