"""Round-16 A/B + parity probe for the _assign argmax-fold rewrite.

Old form: crossJoin(broadcast(cent)) -> per-id row_number window ->
rn=1. The window forces Exchange hashpartitioning(id) + Sort over
n_rows x n_centroids scored rows — at 100 TB that is a full corpus
shuffle inflated n_centroids-fold, purely to pick each id's max
(guide 2.3/2.4).

New form: fold the centroid set into ONE broadcast row (array of
(cid, cv) structs), score each centroid once with transform(), argmax
with an aggregate() fold — a narrow map, zero exchanges.

This probe:
1. proves PARITY row-for-row between the two forms on the fixture
   embeddings AND on an adversarial local relation (NaN components,
   null vectors, tie vectors, empty centroid set);
2. times both forms interleaved (noop sink, alternating arms within
   one session) on the fixture corpus replicated REPL times so the
   assignment shuffle is visible above fixed cost.

Usage: PYTHONPATH=. python tools/ab_assign_r16.py [--sf DIR] [--repl N]
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repl", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from sparksync.ext import similarity as S
    from sparksync.queries import load
    from sparksync.session import get_spark

    spark = get_spark("ab-assign-r16")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- the OLD window form, frozen here for the A/B ----
    from pyspark.sql import Window

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

    emb = load(spark, args.sf, "embeddings")
    e = emb.select(F.col("vec_id"), S._to_double(F.col("embedding")).alias("v"))
    cent = S._default_centroids(e, 8, "vec_id")

    # ---- parity on the fixture corpus ----
    old = assign_window(e, cent, "vec_id")
    new = S._assign(e, cent, "vec_id")
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    n_old, n_new = old.count(), new.count()
    print(f"fixture parity: old={n_old} new={n_new} sym_diff={diff}")
    assert diff == 0 and n_old == n_new

    # ---- parity on adversarial vectors ----
    nan, null = float("nan"), None
    adv = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),          # centroid 0
            (1, [0.0, 1.0]),          # centroid 1
            (2, [1.0, 1.0]),          # plain
            (3, [nan, 1.0]),          # NaN cos against every centroid
            (4, None),                # null vector -> null cos
            (5, [2.0, 0.0]),          # exact tie broken to lowest cid
            (6, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    ea = adv.select("vec_id", S._to_double(F.col("embedding")).alias("v"))
    ca = S._default_centroids(ea, 2, "vec_id")
    o = sorted((r["vec_id"], r["centroid_id"]) for r in assign_window(ea, ca, "vec_id").collect())
    n = sorted((r["vec_id"], r["centroid_id"]) for r in S._assign(ea, ca, "vec_id").collect())
    print(f"adversarial parity: old={o}")
    print(f"adversarial parity: new={n}")
    assert o == n
    # empty centroid set -> empty output on both arms
    c0 = ca.where(F.lit(False))
    assert assign_window(ea, c0, "vec_id").count() == 0
    assert S._assign(ea, c0, "vec_id").count() == 0
    print("empty-centroid parity: ok")

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

    for r in range(args.rounds):
        tw = timed(assign_window(big, cent, "vec_id"))
        tf = timed(S._assign(big, cent, "vec_id"))
        print(f"round {r}: window={tw}s fold={tf}s")


if __name__ == "__main__":
    main()
