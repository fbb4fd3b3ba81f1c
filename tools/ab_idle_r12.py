"""Round-12 idle probe for the localCheckpoint-loop family watch
(VERDICT r11 #4): q178/q199/q159/q195 read ~1.15-1.35x their r9 idle
levels since r10, with no code/plan delta; the r11 A/B showed it
reproduces at idle and clusters ONLY on this family. This round runs
the prescribed follow-up: the same 7-sample idle medians, PLUS an A/B
of the components loop's materialization — localCheckpoint(eager)
(the shipped default) vs persist(MEMORY_AND_DISK)+count (the new
ckpt_mode knob, graph.py) — on the two queries whose wall time is
dominated by the loop (q159 keeper, q199 report). If the persist arm
erases the elevation, checkpoint I/O is the named cause and the knob
becomes a tuning note; if it doesn't, the elevation is ambient and the
watch closes.

Protocol identical to bench.py / ab_idle_r11.py: noop-format writes,
warm JVM via a small-SF query, calibration = median of 3 codegen-only
range sums, bracketed before/after.

Usage: python tools/ab_idle_r12.py > tools/ab_idle_r12.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
FAMILY = [
    "q178_semantic_dedup",
    "q199_dedup_report",
    "q159_cluster_keeper",
    "q195_dedup_survivorship",
]
AB_TARGETS = ["q159_cluster_keeper", "q199_dedup_report"]
RUNS = 7
AB_RUNS = 5


def main() -> int:
    import sparksync.ext.graph as graph_mod
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("sparksync-ab-idle-r12")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    def calibration() -> float:
        s = []
        for _ in range(3):
            t0 = time.time()
            spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
            s.append(time.time() - t0)
        return round(statistics.median(s), 3)

    def run(name: str, n: int) -> dict:
        samples = []
        for _ in range(n):
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        return {
            "median": round(statistics.median(samples), 3),
            "samples": samples,
        }

    cal_before = calibration()
    out: dict[str, dict] = {}
    for name in FAMILY:
        out[name] = run(name, RUNS)
        print(f"# {name}: {out[name]}", file=sys.stderr)

    # A/B: flip every internal connected_components call to persist
    # mode (queries resolve the symbol from the module at call time)
    ab: dict[str, dict] = {}
    orig_cc = graph_mod.connected_components

    def persist_cc(*a, **k):
        k.setdefault("ckpt_mode", "persist")
        return orig_cc(*a, **k)

    for mode in ("local", "persist"):
        graph_mod.connected_components = orig_cc if mode == "local" else persist_cc
        for name in AB_TARGETS:
            r = run(name, AB_RUNS)
            ab[f"{name}:{mode}"] = r
            print(f"# ab {name} [{mode}]: {r}", file=sys.stderr)
    graph_mod.connected_components = orig_cc
    cal_after = calibration()

    print(
        json.dumps(
            {
                "probe": "ab_idle_r12",
                "sf": 0.1,
                "runs": RUNS,
                "ab_runs": AB_RUNS,
                "calibration_before": cal_before,
                "calibration_after": cal_after,
                "loadavg": list(os.getloadavg()),
                "queries": out,
                "ckpt_ab": ab,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
