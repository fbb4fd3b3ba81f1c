"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale posture (100 TB):
- exact_dedup: one hash-partitioned groupBy on the dedup key — the
  minimum possible shuffle; AQE handles skewed keys.
- jaccard_pairs: exact all-pairs via shingle inverted index. Quadratic
  in posting-list length — it is the *correctness oracle* at small SF;
  the scale path is minhash_dedup_pairs below.
- minhash_dedup_pairs: MinHash signatures + banded LSH. Cost is linear
  in corpus size (K min-aggregations map-side) plus a bucket join whose
  fan-out is controlled by band width; candidates are then verified with
  exact Jaccard, so results equal jaccard_pairs whenever LSH recall
  catches the threshold (r=4, b=32 -> P(catch | j=0.8) > 0.9999).
- simhash: narrow map + one groupBy.
- simhash_pairs: pigeonhole band join — any pair within max_hamming bit
  flips agrees exactly on one of max_hamming+1 bands, so candidates come
  from an equi-join, and bit_count(xor) verifies in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens

SHINGLE_N = 3
# 16 bands x 4 rows = 64 hashes: P(candidate | j=0.8) = 1-(1-0.8^4)^16
# ~ 0.9998, and candidates are verified exactly afterwards, so the only
# risk is a vanishing false-negative rate; halving K from 128 halves
# both the signature aggregation width and plan-compile cost.
MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4  # K = bands * rows


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest id per duplicate group — deterministic, unlike a
    bare dropDuplicates. One shuffle on the dedup key."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count")
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) distinct pairs; docs shorter than SHINGLE_N tokens
    drop out (no shingle -> never a candidate), matching the oracle."""
    toks = tokens(text_col)
    with_t = df.select(F.col(id_col), toks.alias("toks")).where(
        F.size("toks") >= SHINGLE_N
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - SHINGLE_N),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
                F.element_at(F.col("toks"), i + 3),
            ),
        )
    )
    return with_t.select(F.col(id_col), F.explode(sh).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard >= threshold via inverted-index
    self-join. Output: (d1, d2, jacc), d1 < d2."""
    # no .cache(): shingles are a narrow recompute from the scan, and
    # pinning a ~10x-text-size exploded set in executor memory is the
    # wrong trade at 100 TB (and leaks across calls in one session)
    sh = shingles(df, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col(id_col).alias("d1"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("d2"), F.col("n").alias("nb"))
    jacc = F.col("c").cast("double") / (
        F.col("na") + F.col("nb") - F.col("c")
    ).cast("double")
    return (
        common.join(F.broadcast(na), "d1")
        .join(F.broadcast(nb), "d2")
        .select("d1", "d2", jacc.alias("jacc"))
        .where(F.col("jacc") >= threshold)
    )


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    """K minhash values per doc via double hashing: h_i(s) = a(s) + i*b(s)
    with a,b two independent xxhash64 seeds — 2 hash evaluations per
    shingle instead of K (the standard Kirsch-Mitzenmacher construction),
    then K map-side partial min aggregates in one groupBy pass."""
    mask32 = F.lit(0xFFFFFFFF)
    base = sh.select(
        F.col(id_col),
        # 32-bit ranges keep a + K*b far from int64 overflow (ANSI mode
        # throws on wraparound); 32-bit minhash resolution is ample
        F.xxhash64(F.lit("a"), F.col("shingle")).bitwiseAND(mask32).alias("_ha"),
        # force b odd so the stride never degenerates to 0
        F.xxhash64(F.lit("b"), F.col("shingle"))
        .bitwiseAND(mask32)
        .bitwiseOR(F.lit(1))
        .alias("_hb"),
    )
    mins = [
        F.min(F.col("_ha") + F.lit(i) * F.col("_hb")).alias(f"h{i}") for i in range(k)
    ]
    return base.groupBy(id_col).agg(*mins)


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """LSH candidates -> exact-Jaccard verification. The scale path: at
    100 TB the bucket join touches only colliding signatures instead of
    every shingle posting list."""
    sh = shingles(df, id_col, text_col)
    sig = minhash_signatures(sh, id_col, k=bands * rows)
    band_keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select(F.col(id_col), F.explode(band_keys).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    l = buckets.select(F.col(id_col).alias("d1"), "band", "key")
    r = buckets.select(F.col(id_col).alias("d2"), "band", "key")
    cand = (
        l.join(r, ["band", "key"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # verify candidates exactly
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    common = (
        cand.join(a, "d1")
        .join(b.withColumnRenamed("shingle", "shingle2"), "d2")
        .where(F.col("shingle") == F.col("shingle2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col(id_col).alias("d1"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("d2"), F.col("n").alias("nb"))
    jacc = F.col("c").cast("double") / (
        F.col("na") + F.col("nb") - F.col("c")
    ).cast("double")
    return (
        common.join(F.broadcast(na), "d1")
        .join(F.broadcast(nb), "d2")
        .select("d1", "d2", jacc.alias("jacc"))
        .where(F.col("jacc") >= threshold)
    )


SIMHASH_BITS = 48  # stay within positive signed-64 range when assembling
SIMHASH_MAX_HAMMING = 3


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token-level SimHash fingerprint: per-bit +1/-1 majority over
    xxhash64(token). Narrow map + one groupBy(doc) — no join."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    fp = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: (d1, d2, hamming) with hamming <=
    max_hamming, d1 < d2.

    Scale path: split the fingerprint into max_hamming+1 bands — by
    pigeonhole, any pair within max_hamming bit flips agrees exactly on
    at least one band — then equi-join on (band, band_value) and verify
    with bit_count(xor). The join touches only band-colliding rows, so
    cost is sum(|bucket|^2) over 2^width-value buckets, not N^2; the
    verify is pure codegen (no Python, no shuffle beyond the bucket
    join)."""
    n_bands = max_hamming + 1
    width = SIMHASH_BITS // n_bands
    fp = simhash(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    keyed = fp.select(
        F.col(id_col), F.col("simhash"), F.explode(bands).alias("bk")
    ).select(
        id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = keyed.select(F.col(id_col).alias("d1"), F.col("simhash").alias("f1"), "band", "key")
    b = keyed.select(F.col(id_col).alias("d2"), F.col("simhash").alias("f2"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("d1") < F.col("d2"))
        .dropDuplicates(["d1", "d2"])
        .select(
            "d1",
            "d2",
            F.bit_count(F.col("f1").bitwiseXOR(F.col("f2"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
