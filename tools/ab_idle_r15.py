"""Round-15 idle probe (VERDICT r14 #3): adjudicate q203_lm_drift's
2.92x sf0.1->sf1 decade ratio with the standing protocol —
interleaved-calibration samples at BOTH scales on an idle box, plus a
plan read AT SF1 checking the model-side join stayed a broadcast under
AQE (the VERDICT hypothesis: a SortMergeJoin flip at sf1 would be a
plan cause; no flip + clean-calibration ratio near the r14 reading
means the operator genuinely pays ~3x per decade here, and the cause
must be named from the measurement, not guessed).

What q203 actually does per invocation (queries/q200_216: the
census-once/score-later production split, replayed fresh each run):
lm_vocab_census TRAIN pass (bounded 512-token collect) ->
lm_bigram_counts TRAIN pass -> lm_score_against_model SCORE pass (two
corpus aggregations + the broadcast model join + salted top-k). The
sf1 probe corpus has 10x the rows AND a 10x vocabulary (prefixed
replicas), so the census cap binds at sf1 (512 of ~5k types) while at
sf0.1 it holds most of the true vocabulary — the model tables are the
same SIZE at both scales, but sf1's `<unk>` mass is structurally
higher. The probe therefore also records the per-stage split (census /
counts / score) so the decade ratio can be attributed to a stage, not
just observed.

Usage: python tools/ab_idle_r15.py [--skip-gen]   (run SOLO)
Results are recorded in BASELINE.md's round-15 section and the verdict
lands next to q203's row in tools/sf1_probe notes.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sparksync_sf1_probe"


def _cal(spark) -> float:
    t0 = time.time()
    spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
    return round(time.time() - t0, 3)


def main() -> int:
    from sparksync.queries import QUERIES
    from sparksync.session import get_spark

    spark = get_spark("ab-idle-r15")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q09_count_compare"](spark, "/root/testdata/sf0.001").collect()

    import os

    if "--skip-gen" not in sys.argv or not os.path.isdir(SF1):
        from sf1_probe import generate

        generate(spark)

    def run_q203(sf_dir: str) -> float:
        t0 = time.time()
        QUERIES["q203_lm_drift"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    # pre-warm BOTH arms (memory: A/B order confounding — JIT/IO warmup
    # must not be charged to whichever scale runs first)
    run_q203(SF01)
    run_q203(SF1)

    cals, t01, t1 = [_cal(spark)], [], []
    for _ in range(5):
        t01.append(run_q203(SF01))
        cals.append(_cal(spark))
        t1.append(run_q203(SF1))
        cals.append(_cal(spark))
    m01, m1 = statistics.median(t01), statistics.median(t1)

    # per-stage split at both scales (one warm sample each; the stage
    # boundaries are the q203 pipeline's own collect/materialize seams)
    from pyspark.sql import functions as F

    from sparksync.ext import textops

    stages = {}
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        from sparksync.source import load_table

        docs = load_table(spark, sf, "documents")
        train = docs.where(F.col("source") != "src0")
        t0 = time.time()
        vocab = [
            r.tok
            for r in textops.lm_vocab_census(train).orderBy("rnk").collect()
        ]
        t_census = time.time() - t0
        t0 = time.time()
        counts = textops.lm_bigram_counts(train, vocab)
        counts.write.format("noop").mode("overwrite").save()
        t_counts = time.time() - t0
        t0 = time.time()
        textops.lm_score_against_model(
            docs, counts, vocab, mode="fixed"
        ).write.format("noop").mode("overwrite").save()
        t_score = time.time() - t0
        stages[label] = {
            "census": round(t_census, 3),
            "counts": round(t_counts, 3),
            "score": round(t_score, 3),
            "vocab_len": len(vocab),
        }

    # plan read AT SF1: the model join must still be a broadcast
    df = QUERIES["q203_lm_drift"](spark, SF1)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan_read = {
        "BroadcastHashJoin": plan.count("BroadcastHashJoin"),
        "SortMergeJoin": plan.count("SortMergeJoin"),
        "CartesianProduct": plan.count("CartesianProduct"),
        "SinglePartition": plan.count("SinglePartition"),
    }

    print(
        json.dumps(
            {
                "probe": "q203_decade_adjudication_r15",
                "calibration_median": statistics.median(cals),
                "calibration_samples": cals,
                "sf0.1_samples": t01,
                "sf1_samples": t1,
                "sf0.1_median": m01,
                "sf1_median": m1,
                "ratio": round(m1 / m01, 2),
                "stages": stages,
                "sf1_plan": plan_read,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
