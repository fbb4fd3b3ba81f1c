"""Round-15 optimization probe: time a subset of declared queries with
interleaved calibration, optionally under extra Spark confs — the A/B
harness for every optimization decision this round (guide §1: measure
first; BASELINE.md load-sentinel protocol).

Usage:
  python tools/probe_r15.py [--runs N] [--conf k=v ...] [--sf-dir DIR] q20_dedup_minhash ...

Prints one JSON line: {"confs": {...}, "cal": [...], "queries": {name:
{"samples": [...], "median": m}}}. Run SOLO on an idle box.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main(argv: list[str] | None = None) -> int:
    import argparse
    import os

    ap = argparse.ArgumentParser(prog="probe_r15.py")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[], metavar="K=V")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args(argv)

    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("probe-r15", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    def cal() -> float:
        t0 = time.time()
        spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
        return round(time.time() - t0, 3)

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    cals = [cal()]
    out: dict[str, dict] = {}
    for name in args.queries:
        run(name)  # warm (cold sample excluded, matching bench medians)
        samples = []
        for _ in range(args.runs):
            samples.append(run(name))
        cals.append(cal())
        out[name] = {
            "samples": samples,
            "median": round(statistics.median(samples), 3),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"confs": extra, "cal": cals, "queries": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
