"""Round-13 interleaved A/B: _ngrams transform+get (OLD) vs chained
zip_with (NEW) on q20_dedup_minhash at sf0.1 — the adjudication behind
BASELINE.md's round-13 record. Order-confounding caution: a first
sequential A/B ran NEW cold-first and misread JIT warmup as a NEW
regression; this interleaved protocol (warm both arms, then alternate)
is the one to trust.

Measured on the round-13 box (idle, calibration ~0.19):
  NEW [3.441, 3.433, 3.217, 3.410]  median 3.42
  OLD [3.239, 3.349, 3.231, 3.817]  median 3.29
-> a wash where the banded join dominates; the construction-dominated
paths improved outright (distinct-trigram pass 4.7 -> 0.5 s, q84
filter report 7.2 -> 2.0 s, q217 attrition 4.3 -> 0.98 s).

Usage: python tools/ab_idle_r13.py  (prints per-arm samples + medians)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from pyspark.sql import functions as F

    from sparksync.ext import features, textops
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-idle-r13")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    def old_ngrams(toks, n):
        size = F.size(toks)
        return F.when(
            size >= n,
            F.transform(
                F.sequence(F.lit(0), size - n),
                lambda i: F.concat_ws(
                    " ", *[F.get(toks, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    new_ngrams = textops._ngrams
    arms = {"NEW": new_ngrams, "OLD": old_ngrams}

    def run_once() -> float:
        features.release_pinned()
        t0 = time.time()
        QUERIES["q20_dedup_minhash"](spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.time() - t0, 3)

    # warm BOTH code paths before any timed sample (the sequential
    # first attempt charged JIT warmup to whichever arm ran first)
    for impl in arms.values():
        textops._ngrams = impl
        run_once()

    res: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(4):
        for label, impl in arms.items():
            textops._ngrams = impl
            res[label].append(run_once())
    textops._ngrams = new_ngrams
    print(res)
    print({k: statistics.median(v) for k, v in res.items()})
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
