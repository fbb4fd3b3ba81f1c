"""Round-16 four-arm A/B for `_assign` (guide §1: measure, interleaved,
one process). Arms:

  A window        — the r15 production form (crossJoin -> row_number)
  B fold          — broadcast 1-row centroid array -> array_max, 0 exchanges
  C fold+hoist    — B with norm(v) computed once per row and norm(cv)
                    once per centroid (bit-identical arithmetic: same
                    float ops in the same order, just not repeated)
  D window+hoist  — A with the same hoisting

Parity: every arm must emit row-identical output to A on the fixture
corpus AND on adversarial vectors (NaN, null vector, exact ties).

Usage: PYTHONPATH=. python tools/ab_assign_r16b.py [--sf DIR] [--repl N] [--rounds N]
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repl", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from sparksync.ext import similarity as S
    from sparksync.queries import load
    from sparksync.session import get_spark

    spark = get_spark("ab-assign-r16b")
    spark.sparkContext.setLogLevel("ERROR")

    def assign_window(e, cent, id_col):
        scored = e.crossJoin(F.broadcast(cent)).select(
            F.col(id_col), F.col("cid"),
            S.cosine(F.col("v"), F.col("cv")).alias("cos"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col(id_col), F.col("cid").alias("centroid_id"))
        )

    def assign_fold(e, cent, id_col):
        cents = cent.agg(
            F.collect_list(F.struct(F.col("cid"), F.col("cv"))).alias("_cents")
        )
        best = F.array_max(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    S.cosine(F.col("v"), c["cv"]).alias("cos"),
                    (-c["cid"]).alias("ncid"),
                ),
            )
        )
        return (
            e.crossJoin(F.broadcast(cents))
            .select(F.col(id_col), best.alias("_b"))
            .where(F.col("_b").isNotNull())
            .select(F.col(id_col), (-F.col("_b.ncid")).alias("centroid_id"))
        )

    def assign_fold_hoist(e, cent, id_col):
        cents = cent.select(
            "cid", "cv", S.norm(F.col("cv")).alias("_ncv")
        ).agg(
            F.collect_list(F.struct(F.col("cid"), F.col("cv"), F.col("_ncv"))).alias(
                "_cents"
            )
        )
        best = F.array_max(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    (S.dot(F.col("v"), c["cv"]) / (F.col("_nv") * c["_ncv"])).alias(
                        "cos"
                    ),
                    (-c["cid"]).alias("ncid"),
                ),
            )
        )
        return (
            e.withColumn("_nv", S.norm(F.col("v")))
            .crossJoin(F.broadcast(cents))
            .select(F.col(id_col), best.alias("_b"))
            .where(F.col("_b").isNotNull())
            .select(F.col(id_col), (-F.col("_b.ncid")).alias("centroid_id"))
        )

    def assign_window_hoist(e, cent, id_col):
        centh = cent.select("cid", "cv", S.norm(F.col("cv")).alias("_ncv"))
        scored = (
            e.withColumn("_nv", S.norm(F.col("v")))
            .crossJoin(F.broadcast(centh))
            .select(
                F.col(id_col),
                F.col("cid"),
                (S.dot(F.col("v"), F.col("cv")) / (F.col("_nv") * F.col("_ncv"))).alias(
                    "cos"
                ),
            )
        )
        w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col(id_col), F.col("cid").alias("centroid_id"))
        )

    arms = {
        "A_window": assign_window,
        "B_fold": assign_fold,
        "C_fold_hoist": assign_fold_hoist,
        "D_window_hoist": assign_window_hoist,
    }

    emb = load(spark, args.sf, "embeddings")
    e = emb.select(F.col("vec_id"), S._to_double(F.col("embedding")).alias("v"))
    cent = S._default_centroids(e, 8, "vec_id")

    # ---- parity: every arm row-identical to A on fixture + adversarial ----
    ref = assign_window(e, cent, "vec_id")
    for name, fn in arms.items():
        if name == "A_window":
            continue
        cand = fn(e, cent, "vec_id")
        diff = ref.exceptAll(cand).count() + cand.exceptAll(ref).count()
        print(f"fixture parity {name}: sym_diff={diff}")
        assert diff == 0

    nan = float("nan")
    adv = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 1.0]),
            (3, [nan, 1.0]),
            (4, None),
            (5, [2.0, 0.0]),
            (6, [0.5, 0.5]),
            # NOTE: a zero vector ([0.0, 0.0]) is NOT a parity case —
            # under Spark 4 ANSI mode cosine's division throws
            # DIVIDE_BY_ZERO identically in every arm (shared cosine()).
        ],
        "vec_id long, embedding array<double>",
    )
    ea = adv.select("vec_id", S._to_double(F.col("embedding")).alias("v"))
    ca = S._default_centroids(ea, 2, "vec_id")
    ref_rows = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in assign_window(ea, ca, "vec_id").collect()
    )
    for name, fn in arms.items():
        rows = sorted(
            (r["vec_id"], r["centroid_id"]) for r in fn(ea, ca, "vec_id").collect()
        )
        print(f"adversarial {name}: {rows}")
        assert rows == ref_rows, name

    # ---- interleaved timing on a replicated corpus ----
    big = e
    for i in range(1, args.repl):
        big = big.unionAll(
            e.select((F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"), "v")
        )
    big = big.localCheckpoint()
    print(f"replicated corpus rows: {big.count()}")

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    results: dict[str, list[float]] = {k: [] for k in arms}
    for r in range(args.rounds):
        parts = []
        for name, fn in arms.items():
            t = timed(fn(big, cent, "vec_id"))
            results[name].append(t)
            parts.append(f"{name}={t}s")
        print(f"round {r}: " + " ".join(parts), flush=True)
    print("== summary ==")
    for name, ts in results.items():
        print(f"{name}: {ts}")


if __name__ == "__main__":
    main()
