"""Round-16 decade A/B harness: time named queries at the synthesized
sf1 probe corpus (tools/sf1_probe.py's generator, reused verbatim) and
at sf0.1, in ONE process, printing cold+warm samples. Arms are code
states (working tree vs stash), alternated by the caller across
processes — interleave rounds A,B,A,B on an idle box and read medians,
never session-vs-session (BASELINE.md protocol).

Usage: python tools/ab_sf1_r16.py [--gen] [--runs N] query [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import argparse

    from tools.sf1_probe import PROBE_DIR, SRC_DIR, generate

    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true", help="(re)generate the sf1 corpus")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-sf01", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-sf1-r16")
    spark.sparkContext.setLogLevel("ERROR")
    if args.gen:
        generate(spark)
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()
    cals = []
    for _ in range(2):
        t0 = time.time()
        spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
        cals.append(round(time.time() - t0, 3))

    dirs = [("sf1", PROBE_DIR)]
    if not args.skip_sf01:
        dirs.insert(0, ("sf0.1", SRC_DIR))
    out: dict = {"cal": min(cals)}
    for name in args.queries:
        per = {}
        for label, d in dirs:
            samples = []
            for _ in range(args.runs):
                t0 = time.time()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
            per[label] = samples
        out[name] = per
        print(f"# {name}: {per}", file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
