"""Skew mitigation: salted joins and two-stage distinct aggregation.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime, but two shapes still need explicit salting at 100 TB:

- a shuffle join where one hot key holds a large fraction of the rows
  (AQE splits partitions, not single keys, when the build side can't
  broadcast);
- count_distinct over a hot group, where every distinct value of the
  hot key must land in one task.

Both helpers are exact — salting only changes the partitioning, never
the result — and deterministic (salt = hash of the row's own key
material, not rand()), so retried tasks produce identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join left⋈right on `on` where `right` is small-ish per key
    but too big to broadcast whole and `on` is skewed in `left`.

    left rows scatter across n_salts sub-keys via hash(salt_from);
    right rows replicate n_salts times. The shuffle key becomes
    (on, salt), so a hot key spreads over n_salts tasks at the cost of
    |right| * n_salts replicated rows — the standard trade.

    Only inner/left are correct here: with how='right' or 'full', an
    unmatched right row survives once PER REPLICA (n_salts copies in
    the output), so those modes are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, got how={how!r}: "
            "unmatched right rows would be duplicated n_salts times"
        )
    l_salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    lft = left.withColumn("_salt", l_salt)
    return lft.join(r, [on, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact count(distinct value) per group, skew-safe: stage 1 drops
    duplicate (group, value) pairs within (group, salt(value)) —
    the same value always salts identically, so cross-partition
    duplicates cannot survive — stage 2 sums per-salt distinct counts.
    The hot group's distinct set is processed by n_salts tasks instead
    of one."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )
    stage1 = (
        salted.groupBy(group_col, "_salt")
        .agg(F.count_distinct(F.col(value_col)).alias("_part"))
    )
    return stage1.groupBy(group_col).agg(
        F.sum("_part").cast("long").alias("distinct_count")
    )


def key_skew_stats(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Hot-key profile — the measurement that decides whether a join or
    aggregation needs salting at all: the top_k heaviest keys with
    count, share of all rows, and skew factor (count / mean rows per
    key; 1.0 = perfectly uniform). Output: (key, cnt, total_rows,
    n_keys, share, skew_factor), heaviest first, key-ordered on ties.

    One groupBy(key) count (map-side partial agg), a one-row totals
    aggregate broadcast back, and TakeOrderedAndProject for the top-k —
    never a global sort, never a collect. share and skew_factor divide
    exact bigints, so the doubles are engine-portable."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_nkeys"),
    )
    top = counts.orderBy(F.desc("cnt"), F.col(key_col)).limit(top_k)
    return top.crossJoin(F.broadcast(tot)).select(
        F.col(key_col),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("_total").alias("total_rows"),
        F.col("_nkeys").alias("n_keys"),
        (F.col("cnt").cast("double") / F.col("_total").cast("double")).alias("share"),
        (
            # factors cast to double BEFORE the multiply: cnt * n_keys
            # in long arithmetic wraps past 2^63 exactly at the table
            # sizes this module targets (code-review r12; ks_statistic
            # documents the same hazard)
            F.col("cnt").cast("double") * F.col("_nkeys").cast("double")
            / F.col("_total").cast("double")
        ).alias("skew_factor"),
    )


def approx_distinct_kmv(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    n_salts: int = 32,
) -> DataFrame:
    """ENGINE-PORTABLE approximate distinct count per group via a KMV
    (k-minimum-values) sketch — the deterministic complement of
    approx_count_distinct: Spark's HLL++ estimate is engine-internal
    (rows-only gate q48), while KMV over a portable md5-derived 60-bit
    hash replays EXACTLY in any engine with md5, so the estimate itself
    is oracle-checkable. Output: (group, n_distinct) where n_distinct
    is exact when the group has <= k distinct values (the kth minimum
    doesn't exist -> the sketch IS the value set) and the KMV estimator
    floor((k-1) * 2^60 / h_k) otherwise.

    Scale shape: one (group, hash) groupBy collapses duplicates with
    map-side combine, then k-min per group in TWO window phases (the
    vocab_topk salt discipline — no task ever sorts a whole group's
    distinct set; phase 2 sorts <= n_salts*k rows per group), then one
    tiny per-group aggregate. Memory is O(k) per group by construction
    — the property that lets a 100 TB cardinality profile run in fixed
    memory, while staying bit-reproducible across engines."""
    from pyspark.sql import Window

    from .dedup import md5_token_hash

    h = md5_token_hash(F.col(value_col).cast("string"))
    distinct = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), h.alias("h"))
        .groupBy("grp", "h")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .drop("_dup")
    )
    w_salt = Window.partitionBy("grp", "_salt").orderBy("h")
    w_grp = Window.partitionBy("grp").orderBy("h")
    kmin = (
        distinct.withColumn("_salt", F.pmod(F.col("h"), F.lit(n_salts)))
        .withColumn("_r", F.row_number().over(w_salt))
        .where(F.col("_r") <= k)
        .withColumn("_rn", F.row_number().over(w_grp))
        .where(F.col("_rn") <= k)
    )
    space = float(2**60)
    est = F.floor(F.lit(float(k - 1)) * F.lit(space) / F.col("_hk")).cast("long")
    return (
        kmin.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("_nk"),
            F.max("h").alias("_hk"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.when(F.col("_nk") < k, F.col("_nk").cast("long"))
            .otherwise(est)
            .alias("n_distinct"),
        )
    )


HLL_M = 256  # default registers; standard error ~1.04/sqrt(m) = 6.5%


def hll_alpha(m: int) -> float:
    """alpha_m (Flajolet et al. 2007): 0.7213 / (1 + 1.079/m) — the
    paper's closed form for m >= 128; at m=64 it evaluates to 0.7093
    vs the paper's tabulated 0.709, well inside the sketch's own error
    band, so this PORTABLE sketch uses the one formula at every
    register count. Both the Spark expression (hll_estimate) and the
    SQL oracle (_oracle_hll) embed the repr of THIS function's float,
    so the constant is the identical double in both engines."""
    return 0.7213 / (1 + 1.079 / m)


def hll_rank_base(m: int) -> int:
    """Max possible rank for a 60-bit md5 hash split as (h mod m,
    h div m): the remainder keeps 60 - log2(m) bits, ranks run
    1..that+1 (the +1 is the all-zero remainder). m must be a power of
    two so the split is exact. m=256 -> 53, the historical constant."""
    lg = m.bit_length() - 1
    if m != 1 << lg:
        raise ValueError("hll register count must be a power of two")
    return 60 - lg + 1


def _hll_linear_table(m: int = HLL_M) -> list:
    """Linear-counting estimates m * ln(m / V) for every possible
    zero-register count V in 1..m — the small-range correction the raw
    HLL estimator needs (it is biased toward alpha*m when most
    registers are empty). ln() is NOT cross-engine bit-stable (the
    q189 lesson), but V is an INTEGER, so the whole correction
    collapses to this m-double lookup table computed once by
    Python's libm and inlined as identical literals in the Spark
    expression and the SQL oracle — both engines index the same
    constants and never call their own log."""
    import math

    return [m * math.log(m / v) for v in range(1, m + 1)]


HLL_LINEAR_TABLE = _hll_linear_table()


def approx_distinct_hll(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = HLL_M,
) -> DataFrame:
    """ENGINE-PORTABLE HyperLogLog distinct count per group — the HLL
    counterpart of approx_distinct_kmv, closing the one rows-only gap
    in the sketch family: q48's approx_count_distinct demonstrates
    Spark's native HLL++ (estimate is engine-internal), while this
    sketch's estimate replays BIT-EXACTLY in any engine with md5, so
    the approximation itself is oracle-checkable.

    Portability is engineered end to end: the 60-bit md5 hash
    (dedup.md5_token_hash) splits into register index (h mod 256) and
    a 52-bit remainder whose rank (leading zeros + 1) comes from
    `53 - length(bin(r))` — string length of the binary rendering, an
    exact integer in every engine, never floor(log2(r)) (libm). The
    harmonic denominator sum(2^-M_j) is scaled by 2^53 into EXACT
    int64 arithmetic (empty registers contribute 2^53 each; max
    256 * 2^53 = 2^61 < int64), and the final estimate is a fixed
    chain alpha * m^2 * 2^53 / S_int of exact-power-of-two doubles
    with one data-dependent division — correctly rounded identically
    under IEEE. The small-range branch (raw estimate <= 2.5m with
    empty registers present) applies classical linear counting
    m * ln(m/V) WITHOUT calling ln(): V is an integer in 1..m, so the
    correction is a 256-double lookup table precomputed by one libm
    (Python's) and inlined identically on both engines
    (HLL_LINEAR_TABLE) — the branch condition itself compares doubles
    both engines computed identically, so the branch never diverges.
    Accuracy vs exact distinct is tolerance-tested in pytest.

    Scale shape: one (group, register) groupBy with map-side combine
    (shuffle carries <= m rows per group), one per-group aggregate —
    fixed O(m) memory per group, mergeable by construction, the same
    100 TB contract as Spark's own HLL. The two stages are exposed as
    hll_registers / hll_estimate so the STREAMING twin
    (ext/stream.hll_registers_stream) can keep the register table live
    and reuse the identical finisher. Output: (group,
    nonzero_registers, hll_est)."""
    return hll_estimate(hll_registers(df, group_col, value_col, m), group_col, m)


def hll_registers(
    df: DataFrame, group_col: str, value_col: str, m: int = HLL_M
) -> DataFrame:
    """The HLL sketch STATE: per (group, register) max rank — <= m rows
    per group by construction, mergeable by max. Works identically on
    a streaming DataFrame (max is commutative-mergeable, no watermark
    needed). Output: (grp, _j, _m)."""
    from .dedup import md5_token_hash

    rb = hll_rank_base(m)
    h = md5_token_hash(F.col(value_col).cast("string"))
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), h.alias("_h"))
        .withColumn("_j", F.pmod(F.col("_h"), F.lit(m)))
        .withColumn("_r", F.expr(f"_h div {m}"))
        .withColumn(
            "_rank",
            F.when(
                F.col("_r") > 0, F.lit(rb) - F.length(F.bin(F.col("_r")))
            )
            .otherwise(F.lit(rb))
            .cast("int"),
        )
    )
    return base.groupBy("grp", "_j").agg(F.max("_rank").alias("_m"))


def hll_estimate(regs: DataFrame, group_col: str, m: int = HLL_M) -> DataFrame:
    """Finish a (grp, _j, _m) register table into per-group estimates —
    the batch-side read over the tiny live table in the streaming
    composition, and the second stage of approx_distinct_hll. The
    int64 scaling is 2^rank_base: empty registers contribute
    2^rank_base each, so the exact-sum bound is m * 2^rank_base =
    2^61 at EVERY power-of-two m (the exponents trade off) — always
    inside int64."""
    rb = hll_rank_base(m)
    two_rb = 1 << rb
    alpha = hll_alpha(m)
    table = _hll_linear_table(m) if m != HLL_M else HLL_LINEAR_TABLE
    agg = regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("_nreg"),
        # shiftleft with a column-valued shift needs the SQL form (the
        # Python wrapper only takes a literal int)
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rb} - _m)"))
        .cast("long")
        .alias("_sne"),
    )
    s_int = (F.lit(m).cast("long") - F.col("_nreg")) * F.lit(two_rb) + F.col(
        "_sne"
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(two_rb))
        / s_int.cast("double")
    )
    zeros = F.lit(m).cast("long") - F.col("_nreg")
    lin = F.element_at(
        F.array(*[F.lit(x) for x in table]),
        F.greatest(zeros, F.lit(1)).cast("int"),
    )
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw)
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("_nreg").alias("nonzero_registers"),
        est.alias("hll_est"),
    )


def cms_slots(
    col: "F.Column",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> "F.Column":
    """The count-min slot addresses of one value: array of `depth`
    portable-md5 hashes mod `width`. THE single source of the CMS hash
    family — both the batch sketch below and the streaming sketch
    (ext/stream.cms_counters_stream) build from this, so the two can
    never drift."""
    from .dedup import md5_token_hash

    return F.array(
        *[
            F.pmod(
                md5_token_hash(
                    F.concat_ws("|", F.lit(salt), F.lit(str(j)), col)
                ),
                F.lit(width),
            )
            for j in range(depth)
        ]
    )


def heavy_hitters_cms(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Heavy hitters via an ENGINE-PORTABLE count-min sketch
    (Cormode-Muthukrishnan): depth hash rows x width counters, estimate
    = min over rows of the addressed counter — always >= the true
    count, with overestimate bounded by (e/width)*N per row. Like
    approx_distinct_kmv above, the slot hashes derive from the portable
    md5 60-bit hash, so the APPROXIMATE estimates themselves replay
    bit-exactly in any engine with md5 — integer mins of integer sums,
    no engine-internal sketch state.

    Scale shape: the sketch build is one narrow map (the depth slot
    ids computed per row, posexploded) into a groupBy((row,slot)) whose
    map-side combine collapses everything to <= depth*width counter
    rows — fixed memory regardless of input size. The candidate side is
    one row per DISTINCT value (the skew-immune side), re-hashed and
    joined to the tiny counter table (broadcast by AQE), then min'd
    per value. Top-k lands via orderBy+limit (TakeOrderedAndProject —
    no global sort materializes). exact_count rides along so the
    output doubles as a sketch-error audit. Output: (value, est_count,
    exact_count), est >= exact always."""
    def slots(col: F.Column) -> F.Column:
        return cms_slots(col, depth=depth, width=width, salt=salt)

    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("val")
    )
    counters = (
        vals.select(F.posexplode(slots(F.col("val"))).alias("j", "slot"))
        .groupBy("j", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = vals.groupBy("val").agg(F.count(F.lit(1)).alias("exact_count"))
    addressed = vocab.select(
        "val", "exact_count", F.posexplode(slots(F.col("val"))).alias("j", "slot")
    )
    return (
        addressed.join(counters, ["j", "slot"])
        .groupBy("val", "exact_count")
        .agg(F.min("cnt").alias("est_count"))
        .select(
            F.col("val").alias("value"),
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
        )
        .orderBy(F.desc("est_count"), "value")
        .limit(k)
    )


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    rate: float = 0.2,
    salt: str = "sq",
) -> DataFrame:
    """Quantile profile on a DETERMINISTIC hash sample — the third
    portable sketch alongside KMV (distincts) and CMS (frequencies):
    approximate-by-design, yet every number replays bit-exactly in any
    engine, because the "randomness" is the md5-portable hash
    thresholded at floor(rate * 2^60) and the quantiles on the sample
    are exact interpolated percentiles (the q47 equivalence). Spark's
    own approx_percentile (Greenwald-Khanna) is the engine-internal
    alternative — same trade, but its estimate can't be oracle-checked.

    Scale shape: one narrow codegen filter keeps ~rate of rows (no
    shuffle, no second scan), then one grouped percentile over the
    sample — memory is the sample's group size, tunable by rate.
    Output: (group, n_sampled, p25, p50, p75, p95)."""
    from .dedup import md5_token_hash

    thr = int(rate * float(2**60))
    h = md5_token_hash(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    s = df.where(h < F.lit(thr))
    pct = "percentile(cast({v} as double), {p})"
    return s.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        *[
            F.expr(pct.format(v=value_col, p=p)).alias(name)
            for p, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95"))
        ],
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 256,
    n_salts: int = 32,
) -> DataFrame:
    """Sketch-algebra set overlap: estimate |A∩B|, |A∪B| and Jaccard
    between two columns WITHOUT materializing either distinct set —
    the KMV sketches of A and B merge (union = k smallest of the
    combined hash sets) and the fraction of the union sketch present
    in both sides estimates Jaccard (Beyer et al., "distinct-value
    synopses"). This is how you size a join or dedup overlap at 100 TB
    before running it. Same portable md5 60-bit hash as
    approx_distinct_kmv, so every number — including the APPROXIMATE
    estimates — replays bit-exactly in the oracle. Exact when
    |A∪B| <= k (the sketch IS the union).

    Scale shape: each side collapses to distinct hashes with map-side
    combine, k-mins via the salted two-phase window discipline, then
    everything downstream touches <= 2k rows. Output one row:
    (n_a_est, n_b_est, union_est, intersection_est, jaccard_est)."""
    from pyspark.sql import Window

    from .dedup import md5_token_hash

    def kmin(df: DataFrame, side: str) -> DataFrame:
        h = md5_token_hash(F.col(value_col).cast("string"))
        d = (
            df.where(F.col(value_col).isNotNull())
            .select(h.alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("_dup"))
            .drop("_dup")
        )
        w_salt = Window.partitionBy("_salt").orderBy("h")
        w_all = Window.orderBy("h")
        return (
            d.withColumn("_salt", F.pmod(F.col("h"), F.lit(n_salts)))
            .withColumn("_r", F.row_number().over(w_salt))
            .where(F.col("_r") <= k)
            .withColumn("_rn", F.row_number().over(w_all))
            .where(F.col("_rn") <= k)
            .select(F.col("h"), F.lit(side).alias("side"))
        )

    ka, kb = kmin(a, "a"), kmin(b, "b")
    space = float(2**60)

    def est(n_col: F.Column, hk: F.Column) -> F.Column:
        return F.when(n_col < k, n_col.cast("long")).otherwise(
            F.floor(F.lit(float(k - 1)) * F.lit(space) / hk).cast("long")
        )

    # the union sketch: k smallest distinct hashes of A ∪ B; mark which
    # sides each survivor belongs to (<= 2k rows from here on)
    u = (
        ka.unionByName(kb)
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("side") == "a", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("side") == "b", 1).otherwise(0)).alias("in_b"),
        )
        .withColumn("_rn", F.row_number().over(Window.orderBy("h")))
        .where(F.col("_rn") <= k)
    )
    per_side_a = ka.groupBy().agg(
        F.count(F.lit(1)).alias("na"), F.max("h").alias("hka")
    )
    per_side_b = kb.groupBy().agg(
        F.count(F.lit(1)).alias("nb"), F.max("h").alias("hkb")
    )
    stats = u.groupBy().agg(
        F.count(F.lit(1)).alias("nu"),
        F.max("h").alias("hku"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("nboth"),
    )
    out = stats.crossJoin(F.broadcast(per_side_a)).crossJoin(
        F.broadcast(per_side_b)
    )
    union_est = est(F.col("nu"), F.col("hku"))
    jacc = F.col("nboth").cast("double") / F.col("nu").cast("double")
    return out.select(
        est(F.col("na"), F.col("hka")).alias("n_a_est"),
        est(F.col("nb"), F.col("hkb")).alias("n_b_est"),
        union_est.alias("union_est"),
        F.floor(jacc * union_est.cast("double")).cast("long").alias(
            "intersection_est"
        ),
        jacc.alias("jaccard_est"),
    )


def bloom_bitmap(
    build: DataFrame,
    key_col: str,
    m_bits: int = 256,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """A PORTABLE Bloom filter as a (word, bits) relation: each build
    key sets k md5-derived bit positions (replayable by any engine
    with md5 — the md5_token_hash contract), packed into 64-bit words
    with a bit_or aggregate. m_bits/64 rows total — broadcastable at
    any corpus size, because the bitmap is fixed-size by construction.
    The distributed analogue of Spark's own runtime bloom-filter
    pushdown, materialized as data so its effect is auditable."""
    from .dedup import md5_token_hash

    pos = [
        F.pmod(
            md5_token_hash(
                F.concat(
                    F.lit(f"{salt}:{i}:"), F.col(key_col).cast("string")
                )
            ),
            F.lit(m_bits),
        )
        for i in range(k)
    ]
    bits = build.select(
        F.explode(F.array(*pos)).alias("_pos")
    ).distinct()
    return (
        bits.select(
            (F.col("_pos") / F.lit(64)).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias("_m"),
        )
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_semi_join_audit(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 256,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join with a full honesty audit: how many probe
    rows the bitmap passes vs the exact semi-join, i.e. the measured
    false-positive overhead of pushing a runtime filter instead of
    shuffling the probe side. The probe tests membership with k
    broadcast word-lookups (left join against the m_bits/64-row bitmap
    — a missing word means bit unset); a row passes iff ALL k bits are
    set. No explode of the probe side survives to the output: the k
    positions ride one array column and the k lookups collapse into a
    per-row aggregate after a broadcast join. Output: one row
    (n_probe, n_bloom_pass, n_true_match, false_positives, fp_rate)."""
    from .dedup import md5_token_hash

    def positions(key_col: str):
        return [
            F.pmod(
                md5_token_hash(
                    F.concat(
                        F.lit(f"bloom:{i}:"), F.col(key_col).cast("string")
                    )
                ),
                F.lit(m_bits),
            )
            for i in range(k)
        ]

    bitmap = bloom_bitmap(build, build_key, m_bits, k)
    # _rid must be assigned BEFORE the explode: inside the generator's
    # select it would evaluate per generated row and the k position
    # checks would never collapse back to one row
    rows = probe.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.col(probe_key).alias("_key"),
    )
    probed = rows.select(
        "_rid",
        "_key",
        F.posexplode(F.array(*positions("_key"))).alias("_i", "_pos"),
    ).select(
        "_rid",
        "_key",
        (F.col("_pos") / F.lit(64)).cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(pmod(_pos, 64) as int))").alias("_m"),
    )
    checked = probed.join(F.broadcast(bitmap), "word", "left").withColumn(
        "_set",
        ((F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m"))) != 0)
        .cast("long"),
    )
    per_row = checked.groupBy("_rid", "_key").agg(
        (F.sum("_set") == F.lit(k)).cast("long").alias("_pass")
    )
    truth = build.select(F.col(build_key).alias("_key")).distinct().withColumn(
        "_true", F.lit(1).cast("long")
    )
    flags = per_row.join(F.broadcast(truth), "_key", "left").select(
        "_pass", F.coalesce("_true", F.lit(0)).alias("_true")
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum("_pass").cast("long").alias("n_bloom_pass"),
        F.sum("_true").cast("long").alias("n_true_match"),
        F.sum(
            (F.col("_pass") == 1).cast("long")
            * (F.col("_true") == 0).cast("long")
        )
        .cast("long")
        .alias("false_positives"),
    ).withColumn(
        "fp_rate",
        F.col("false_positives").cast("double")
        / F.col("n_probe").cast("double"),
    )


_LONG_MAX = "9223372036854775807"


def _checked_long(c, label: str):
    """decimal(38,0) -> long with a LOUD overflow: values past 2^63-1
    raise at execution instead of the silent NULL a bare cast yields
    with ANSI off (ADVICE r5)."""
    lim = F.lit(_LONG_MAX).cast("decimal(38,0)")
    return F.when(c <= lim, c.cast("long")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"join_size_forecast: {label} exceeds int64: "),
                c.cast("string"),
            )
        )
    )


def join_size_forecast(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    top_k: int = 10,
) -> DataFrame:
    """Predict a join's output size BEFORE running it — the 'will this
    join explode?' check a 100 TB planner wants as data, not as a
    post-mortem. |A join B| = sum over shared keys of cnt_a * cnt_b,
    computed from the two per-key count tables (each one
    partial-aggregated shuffle over keys, never over rows); products
    accumulate in decimal(38,0) so hot keys cannot wrap a long, and the
    long-typed output is OVERFLOW-CHECKED: a forecast beyond 2^63-1
    rows raises loudly instead of silently NULLing (ADVICE r5 — the
    exact scenario this forecast exists to catch must not vanish;
    Decimal-typed outputs are avoided by repo convention because the
    driver's DuckDB float64 bridge can't hash them). Output: the top_k
    contributing keys with their exact share of the forecast — the keys
    to salt or filter first. (key, cnt_a, cnt_b, out_rows, total_out,
    share), ordered by contribution."""
    ca = a.groupBy(F.col(key_a).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt_a")
    )
    cb = b.groupBy(F.col(key_b).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt_b")
    )
    dec = "decimal(38,0)"
    per = ca.join(cb, "key").withColumn(
        "out_rows", F.col("cnt_a").cast(dec) * F.col("cnt_b").cast(dec)
    )
    tot = per.agg(F.sum("out_rows").alias("_t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt_a",
            "cnt_b",
            _checked_long(F.col("out_rows"), "out_rows").alias("out_rows"),
            _checked_long(F.col("_t"), "total_out").alias("total_out"),
            (F.col("out_rows").cast("double") / F.col("_t").cast("double"))
            .alias("share"),
        )
        .orderBy(F.desc("out_rows"), "key")
        .limit(top_k)
    )


def salting_effectiveness(
    df: DataFrame,
    key_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Model what salting would buy BEFORE rewriting the job: the
    hottest key's row count is the single-task lower bound of an
    unsalted shuffle; splitting every key across n_salts caps any
    (key, salt) task at ceil(cnt / n_salts). One per-key count
    aggregate, one tiny reduction — the decision row for
    ext/skew.salted_* (counts < 2^52 so the ceil's double division is
    exact; beyond that the model is moot anyway). Output: one row
    (n_keys, rows_total, max_key_rows, post_salt_max, speedup)."""
    cnts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    return cnts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_c").cast("long").alias("rows_total"),
        F.max("_c").cast("long").alias("max_key_rows"),
        F.max(F.ceil(F.col("_c").cast("double") / F.lit(n_salts)))
        .cast("long")
        .alias("post_salt_max"),
    ).withColumn(
        "speedup",
        F.col("max_key_rows").cast("double")
        / F.col("post_salt_max").cast("double"),
    )


def quantile_error_audit(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    rate: float = 0.2,
) -> DataFrame:
    """Accuracy audit of the hash-sampled quantile profile: for each
    group and profile quantile (p25/p50/p75/p95), the sampled edge's
    TRUE rank error |{v <= edge}|/n - p, measured exactly against the
    full data — the check that says whether the one-pass approximate
    profile is good enough to replace the exact sort at 100 TB (pair
    with bloom_semi_join_audit and pruning_audit: measure the
    shortcut, don't trust it). Sampling is md5-portable
    (sampled_quantiles); the profile's wide row unpivots to (p, edge);
    the rank count is one broadcast-join aggregate over exact longs;
    ONE final division. Output: (group, p, edge, n_rows, rank_le,
    rank_error)."""
    sq = sampled_quantiles(df, group_col, value_col, id_col, rate=rate)
    long_form = sq.unpivot(
        [group_col], ["p25", "p50", "p75", "p95"], "pname", "edge"
    ).withColumn(
        "p",
        F.when(F.col("pname") == "p25", 0.25)
        .when(F.col("pname") == "p50", 0.5)
        .when(F.col("pname") == "p75", 0.75)
        .otherwise(0.95),
    )
    edges = long_form.select(
        F.col(group_col).alias("_g"), "p", F.col("edge").alias("_e")
    )
    # NULL values can never satisfy _v <= edge (the sum skips them),
    # so they must not inflate the denominator either — the percentile
    # population is non-NULL by definition (code-review r12: a 50%-NULL
    # group read as ~0.25 'error' for a perfectly accurate edge)
    joined = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull()).join(F.broadcast(edges), "_g")
    per = joined.groupBy("_g", "p", "_e").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("_v") <= F.col("_e")).cast("long"))
        .cast("long")
        .alias("rank_le"),
    )
    err = (
        F.col("rank_le").cast("double") / F.col("n_rows").cast("double")
        - F.col("p")
    )
    return per.select(
        F.col("_g").alias(group_col),
        "p",
        F.col("_e").alias("edge"),
        "n_rows",
        "rank_le",
        F.abs(err).alias("rank_error"),
    )
