"""Round-15 A/B: driver-local small-graph connected_components path
(graph._CC_LOCAL_MAX_EDGES) ON vs OFF, interleaved blocks in ONE
session (BASELINE.md load-sentinel protocol; guide §1 measure first).

Arms toggle the module constant in-process (the env knob is read at
import, so the constant IS the switch); spark.catalog.clearCache()
runs at every arm switch so neither arm rides the other's pins. Per
arm-block: 1 warm run + 2 timed runs per query; report per-arm medians
across all blocks.

Usage: python tools/ab_cc_local_r15.py [--rounds N] [q ...]   (run SOLO)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT_QUERIES = [
    "q159_cluster_keeper",
    "q195_dedup_survivorship",
    "q196_cluster_size_histogram",
    "q199_dedup_report",
    "q204_winnow_dedup_report",
    "q211_leakage_safe_split",
    "q212_soft_dedup",
    "q124_entity_resolution",
]


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from sparksync.ext import graph
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-cc-local-r15")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()
    cap_on = graph._CC_LOCAL_MAX_EDGES or (1 << 16)

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

    samples: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in names
    }
    cals = [cal()]
    for rnd in range(args.rounds):
        for arm in ("on", "off") if rnd % 2 == 0 else ("off", "on"):
            graph._CC_LOCAL_MAX_EDGES = cap_on if arm == "on" else 0
            spark.catalog.clearCache()
            for n in names:
                run(n)  # warm
                samples[n][arm].append(run(n))
                samples[n][arm].append(run(n))
        cals.append(cal())
    out = {
        n: {
            "on_median": round(statistics.median(s["on"]), 3),
            "off_median": round(statistics.median(s["off"]), 3),
            "on": s["on"],
            "off": s["off"],
        }
        for n, s in samples.items()
    }
    print(json.dumps({"cal": cals, "queries": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
