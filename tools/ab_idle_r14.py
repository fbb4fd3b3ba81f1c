"""Round-14 idle probes (VERDICT r13 #1 done-criterion + #3):

1. q210 adjudication — BENCH_r13's driver median read 10.182 s vs its
   own cold first sample 4.478 s (the load-spike signature). Standing
   protocol: 7 samples of q210_benchmark_coverage, each bracketed by a
   calibration sample (spark.range(5e8).sum(), bench.py's workload),
   on an idle box. Verdict key: median ≈ 4–4.5 s at calibration ≤0.21
   confirms ambient; anything else names a plan cause.

2. signal_auc A/B — r13 per-signal-loop form (OLD) vs the round-14
   one-scan stack-unpivot + partitioned global_cumsum form (NEW) on
   q221's labeled frame at sf0.1. Interleaved, both arms pre-warmed
   (memory: HOFs/JIT warmup must not be charged to whichever arm runs
   first).

Usage: python tools/ab_idle_r14.py   (run SOLO — no concurrent Spark)
Results are recorded in BASELINE.md's round-14 section.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.1"


def _cal(spark) -> float:
    t0 = time.time()
    spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
    return round(time.time() - t0, 3)


def main() -> int:
    from pyspark.sql import functions as F

    from sparksync.ext import features
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-idle-r14")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    # ---- probe 1: q210 interleaved-calibration idle samples ----
    def run_q210() -> float:
        features.release_pinned()
        t0 = time.time()
        QUERIES["q210_benchmark_coverage"](spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.time() - t0, 3)

    run_q210()  # warm
    cals, q210s = [_cal(spark)], []
    for _ in range(7):
        q210s.append(run_q210())
        cals.append(_cal(spark))
    print("q210 samples:", q210s, "median", statistics.median(q210s))
    print("calibration samples:", cals, "median", statistics.median(cals))

    # ---- probe 2: signal_auc OLD (per-signal loop) vs NEW (one-scan) ----
    def old_signal_auc(df, label_col, signal_cols):
        """The r13 shape: one groupBy + global_cumsum + agg PER signal
        (one full input scan each), unioned."""
        outs = []
        for s in signal_cols:
            d = df.select(
                F.col(s).alias("_v"),
                (F.col(label_col).cast("long") > 0).cast("long").alias("_y"),
            ).where(F.col("_v").isNotNull() & F.col("_y").isNotNull())
            g = d.groupBy("_v").agg(
                F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum("_y").cast("long").alias("_npos"),
            )
            c = features.global_cumsum(g, ["_v"], "_n", "_cum")
            dec = "decimal(38,0)"
            two_rpos = F.col("_npos").cast(dec) * (
                F.lit(2).cast(dec) * (F.col("_cum") - F.col("_n")).cast(dec)
                + F.col("_n").cast(dec)
                + F.lit(1).cast(dec)
            )
            agg = c.agg(
                F.sum(two_rpos).alias("_2rpos"),
                F.sum("_npos").cast("long").alias("n_pos"),
                (F.sum("_n") - F.sum("_npos")).cast("long").alias("n_neg"),
            )
            auc = F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                (
                    F.col("_2rpos")
                    - F.col("n_pos").cast(dec)
                    * (F.col("n_pos").cast(dec) + F.lit(1).cast(dec))
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
            ).otherwise(F.lit(None).cast("double"))
            outs.append(
                agg.select(
                    F.lit(s).alias("signal"), "n_pos", "n_neg",
                    auc.alias("auc"),
                )
            )
        res = outs[0]
        for o in outs[1:]:
            res = res.unionByName(o)
        return res

    arms = {"NEW": features.signal_auc, "OLD": old_signal_auc}

    def run_auc(impl) -> float:
        features.release_pinned()
        t0 = time.time()
        q = QUERIES["q221_signal_auc"]
        # q221 calls features.signal_auc by attribute — patch it
        saved = features.signal_auc
        features.signal_auc = impl
        try:
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        finally:
            features.signal_auc = saved
        return round(time.time() - t0, 3)

    for impl in arms.values():
        run_auc(impl)  # warm both arms
    res: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(4):
        for label, impl in arms.items():
            res[label].append(run_auc(impl))
    print("signal_auc A/B:", res)
    print({k: statistics.median(v) for k, v in res.items()})
    print("final calibration:", _cal(spark))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
