"""Idle A/B for the q178/q199 round-10 bench upticks (VERDICT r10 #3):
both drifted ~1.1x r9->r10 at a CALMER calibration, against the load
direction, with neither hot path edited. This probe re-measures the two
medians on an otherwise-idle machine with MORE samples (7 vs bench.py's
3) bracketed by the same fixed calibration workload, so the verdict is
"ambient" or "a named plan delta" — not a guess.

Protocol identical to bench.py: noop-format write (materializes every
output column), warm JVM via a small-SF query first, calibration =
median of 3 codegen-only range sums. Usage:
    python tools/ab_idle_r11.py > tools/ab_idle_r11.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"
TARGETS = ["q178_semantic_dedup", "q199_dedup_report"]
RUNS = 7


def main() -> int:
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("sparksync-ab-idle")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    def calibration() -> float:
        s = []
        for _ in range(3):
            t0 = time.time()
            spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
            s.append(time.time() - t0)
        return round(statistics.median(s), 3)

    cal_before = calibration()
    out: dict[str, dict] = {}
    for name in TARGETS:
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    cal_after = calibration()
    print(
        json.dumps(
            {
                "probe": "ab_idle_r11",
                "sf": 0.1,
                "runs": RUNS,
                "calibration_before": cal_before,
                "calibration_after": cal_after,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "queries": out,
                # reference points being adjudicated (driver benches):
                "r9": {"q178_semantic_dedup": 3.70, "q199_dedup_report": 3.64,
                       "calibration": 0.28},
                "r10": {"q178_semantic_dedup": 4.16, "q199_dedup_report": 4.00,
                        "calibration": 0.245},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
