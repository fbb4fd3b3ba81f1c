"""Round-15 A/B: _lm_base's bigram-table + census pin (warm-run reuse,
one tokenize pass per run) vs the old all-lazy shape — interleaved
blocks in ONE session (BASELINE.md load-sentinel protocol; guide §1
measure first, §5 persist-when-reused).

Arms flip textops._LM_PIN in-process; cache AND the pin registry are
cleared at every arm switch so neither arm rides the other's
materializations. Per arm-block: 1 warm + 2 timed runs per query (the
bench's median-of-3 shape, so the ON arm's warm reuse is measured
exactly as the bench would see it).

Usage: python tools/ab_lm_pin_r15.py [--rounds N] [q ...]   (run SOLO)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT_QUERIES = ["q200_lm_surprisal", "q202_target_affinity"]


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from sparksync.ext import features, textops
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-lm-pin-r15")
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

    samples: dict[str, dict[str, list[float]]] = {
        n: {"pin": [], "lazy": []} for n in names
    }
    cals = [cal()]
    for rnd in range(args.rounds):
        arms = ("pin", "lazy") if rnd % 2 == 0 else ("lazy", "pin")
        for arm in arms:
            textops._LM_PIN = arm == "pin"
            features.release_pinned()
            spark.catalog.clearCache()
            for n in names:
                run(n)  # warm
                samples[n][arm].append(run(n))
                samples[n][arm].append(run(n))
        cals.append(cal())
    textops._LM_PIN = True
    out = {
        n: {
            "pin_median": round(statistics.median(s["pin"]), 3),
            "lazy_median": round(statistics.median(s["lazy"]), 3),
            "pin": s["pin"],
            "lazy": s["lazy"],
        }
        for n, s in samples.items()
    }
    print(json.dumps({"cal": cals, "queries": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
