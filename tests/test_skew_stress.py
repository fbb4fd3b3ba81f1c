"""Skew stress fixture (VERDICT r6 #8): every dedup/join plan guard in
this repo runs on TPC-H-shaped fixtures whose key distributions are
benign. These tests build a deliberately hostile distribution — ONE hot
key carrying 10% of all rows plus a Zipf tail — and prove the salting /
hot-bucket re-split mechanisms actually BOUND the per-task work, not
just that they exist. The bound is measured on the executed job
(per-output-partition row counts via spark_partition_id, i.e. what each
join/agg task really held), so removing the salt or the cap turns these
red with a concentration number, not a plan-string diff.

The fixture is generated with pure column expressions (xxhash64-seeded
inverse-CDF Pareto), so it is deterministic across runs and engines —
no RNG state, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed_rows(spark, n: int = 600_000, hot_share: float = 0.10):
    """(row_id, key) with key=0 on ~hot_share of rows and a Zipf-ish
    Pareto tail (alpha≈1.5) on the rest. Deterministic: the hot flag
    and the tail rank both derive from xxhash64(row_id)."""
    u = (
        (F.pmod(F.xxhash64(F.col("id"), F.lit("u")), F.lit(1_000_000)) + 1)
        / F.lit(1_000_000.0)
    )
    hot = F.pmod(F.xxhash64(F.col("id"), F.lit("hot")), F.lit(100)) < int(
        hot_share * 100
    )
    # inverse-CDF Pareto: floor(u^(-2)) spans 1..1e12 with a heavy tail;
    # +1 keeps the tail disjoint from the hot key 0
    tail_key = F.floor(F.pow(u, F.lit(-2.0))).cast("long") + 1
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(hot, F.lit(0)).otherwise(tail_key).alias("key"),
    )


def _max_partition_rows(df) -> int:
    """Rows held by the fattest task of the job that produced df's
    final stage — the 100 TB quantity of interest (one straggler task
    = one stage's wall time)."""
    sizes = df.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    return max(r["count"] for r in sizes) if sizes else 0


def test_salted_join_bounds_hot_key_task(spark):
    """q41-family salted_join under a 10%-hot-key fixture: result is
    row-identical to the plain join, and the hot key's rows spread
    across ~n_salts tasks instead of one. Without the salt the fattest
    join task holds every hot-key row (~60k); with it, no task may
    hold more than a third of that.

    AQE partition coalescing is disabled for the measured section: the
    salted partitions are deliberately SMALL, so at low parallelism
    (SPARK_GRAFT_CPUS <= 8) the coalescer legitimately merges them
    back into one task — which is correct engine behavior (the skew is
    gone, the data is tiny) but makes the task-level assertion below
    depend on the test box's core count (green at the driver's 32
    cores, red at 8; found in round 16). The salt's job is the
    PRE-coalesce spread, which is what this pins."""
    from sparksync.ext.skew import salted_join

    # Pin the measured section's physics so the assertion is the SAME
    # deterministic number on any box: shuffle partitions are
    # $SPARK_GRAFT_CPUS-sized by default, so the 16 salt buckets clump
    # differently per core count (pmod of the same hashes into a
    # different bin count), and AQE coalescing merges the deliberately
    # small salted partitions back into one task at low parallelism.
    pinned = {
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "128",
    }
    prev = {k: spark.conf.get(k, None) for k in pinned}
    for k, v in pinned.items():
        spark.conf.set(k, v)
    try:
        _assert_salted_join_bound(spark, salted_join)
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def _assert_salted_join_bound(spark, salted_join):
    left = _skewed_rows(spark)
    hot_rows = left.where("key = 0").count()
    assert hot_rows > 40_000  # fixture really is hostile
    # dim side: one payload row per distinct key (too many distinct
    # keys to pretend it's broadcast-tiny; the salted path replicates)
    right = left.select("key").distinct().withColumn(
        "payload", F.xxhash64("key")
    )
    n_salts = 16
    plain = left.join(right.hint("shuffle_hash"), "key")
    # the same shuffle_hash hint as the plain arm: without it the
    # planner may BROADCAST the replicated right side, the left never
    # shuffles, and the partition sizes below read the scan split size
    # (n / defaultParallelism) instead of the salted shuffle spread —
    # the assertion then tracks the box's core count, not the salt
    # (this test was green-by-broadcast until round 16)
    salted = salted_join(
        left, right.hint("shuffle_hash"), "key",
        salt_from="row_id", n_salts=n_salts,
    )
    assert salted.count() == plain.count() == left.count()
    # executed concentration OF THE HOT KEY: the plain join funnels
    # every key=0 row into one task; the salted join must spread them
    # over ~n_salts tasks. Measured on key=0 rows only — the Pareto
    # tail has its own heavy keys (key=2 holds ~29% of tail rows), so
    # a whole-partition bound would read hash-collision luck between
    # OTHER keys' buckets, not what the salt did to the hot key.
    plain_max = _max_partition_rows(plain.where("key = 0"))
    salted_max = _max_partition_rows(salted.where("key = 0"))
    assert plain_max >= hot_rows, (plain_max, hot_rows)
    assert salted_max <= hot_rows // 3, (
        f"salting failed to spread the hot key: fattest salted task holds "
        f"{salted_max} hot-key rows vs {hot_rows} hot rows"
    )


def test_salted_distinct_count_bounds_hot_group(spark):
    """q41's skew-safe exact distinct under the same fixture: equals
    the plain count_distinct per group, and stage-1's fattest task
    holds a bounded slice of the hot group's values."""
    from sparksync.ext.skew import salted_distinct_count

    n = 200_000
    # hot group 0 owns 10% of rows with ~unique values (worst case for
    # a per-group distinct: the whole value set shuffles to one task)
    df = _skewed_rows(spark, n).select(
        F.col("key").alias("grp"),
        F.col("row_id").alias("val"),
    )
    got = {
        r["grp"]: r["distinct_count"]
        for r in salted_distinct_count(df, "grp", "val", n_salts=16).collect()
    }
    want = {
        r["grp"]: r["dc"]
        for r in df.groupBy("grp")
        .agg(F.count_distinct("val").alias("dc"))
        .collect()
    }
    assert got == want
    # the stage-1 shape: (grp, salt) keys — the hot group's values land
    # on 16 tasks. Reconstruct stage 1 exactly as the operator builds it
    # and measure executed concentration.
    stage1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col("val")), F.lit(16)))
        .groupBy("grp", "_salt")
        .agg(F.count_distinct("val").alias("_part"))
    )
    hot_vals = want[0]
    per_salt = stage1.where("grp = 0").agg(F.max("_part").alias("m")).first()["m"]
    assert per_salt <= hot_vals // 8, (
        f"hot group's distinct set not spread: fattest salt slice {per_salt} "
        f"of {hot_vals} values"
    )


def test_minhash_hot_bucket_resplit_bounds_candidates(spark):
    """q20's _cap_buckets on a template-heavy corpus: 2,000 of 6,000
    docs share one boilerplate template (unique ids inside, so
    signatures differ slightly but most bands collide) — the classic
    crawl pathology that makes banded LSH quadratic. With the cap the
    candidate join is bounded and the fattest bucket after re-split is
    <= cap; identical-text pairs still dedup (recall floor)."""
    from sparksync.ext.dedup import (
        _band_buckets,
        _cap_buckets,
        minhash_signatures,
        shingles,
    )

    template = " ".join(f"boiler plate clause {i} of the standard footer" for i in range(12))
    docs = spark.range(6_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 2_000,
            F.concat(F.lit(template + " serial "), F.col("id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("unique document body "),
                F.sha2(F.col("id").cast("string"), 256),
                F.lit(" with distinct content "),
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("x")), 256),
            )
        )
        .alias("text"),
    )
    sh = shingles(docs, "doc_id", "text")
    sig = minhash_signatures(sh, "doc_id")
    bands, rows = 16, 4
    raw = _band_buckets(sig, "doc_id", bands, rows)
    cap = 200
    capped = _cap_buckets(raw, "doc_id", cap)
    raw_max = (
        raw.groupBy("band", "key").count().agg(F.max("count").alias("m")).first()["m"]
    )
    capped_max = (
        capped.groupBy("band", "key")
        .count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    # the fixture produced a genuinely hot bucket (the template family
    # collides on most bands — including the NEXT band, which is why a
    # single-level re-split cannot bound it: measured 1922 -> 1802
    # before the level-2 shatter existed). After the two-level cap the
    # bound is max(cap, max full-signature multiplicity): docs whose
    # signatures are bit-identical are INDISTINGUISHABLE at the LSH
    # level and must stay together to preserve the jaccard-1.0 recall
    # floor — upstream exact dedup (q18, stage 1 of q50 corpus prep)
    # is the mechanism that keeps that multiplicity ~1 in production.
    sig_mult = (
        sig.groupBy(*[f"h{i}" for i in range(bands * rows)])
        .count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    assert raw_max > 1_000, raw_max
    assert capped_max <= max(cap, sig_mult), (
        f"re-split did not bound the hot bucket: {raw_max} -> {capped_max} "
        f"(signature multiplicity {sig_mult})"
    )


def test_minhash_dedup_completes_and_recalls_on_template_corpus(spark):
    """End-to-end q20 path on the template corpus with a small cap:
    finishes with a bounded candidate set and still finds the exact
    duplicates planted at jaccard 1.0 (the cap's guaranteed-recall
    floor: identical signatures survive every re-split)."""
    from sparksync.ext.dedup import minhash_dedup_pairs

    template = " ".join(f"boiler plate clause {i} of the standard footer" for i in range(12))
    base = spark.range(3_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 1_000,
            F.concat(F.lit(template + " serial "), F.col("id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("unique document body "),
                F.sha2(F.col("id").cast("string"), 256),
            )
        )
        .alias("text"),
    )
    # plant exact duplicates: doc_id+10000 copies of the first 50 docs
    dups = base.where("doc_id < 50").select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    corpus = base.unionByName(dups)
    pairs = minhash_dedup_pairs(corpus, threshold=0.9, bucket_cap=200)
    rows = pairs.collect()
    found = {(r["d1"], r["d2"]) for r in rows}
    for i in range(50):
        assert (i, i + 10_000) in found, f"planted exact dup {i} lost to the cap"
