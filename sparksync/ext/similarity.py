"""Similarity search over an embedding column (array<float>).

- knn_brute: exact cosine top-k for one query vector. Broadcast of the
  query + a single narrow map over the corpus, then a tiny top-k sort —
  the correctness baseline. At 100 TB the map is embarrassingly
  parallel; the sort is on k*partitions rows only (takeOrdered shape).
- ivf_assign / ivf_search: an IVF index expressed relationally —
  centroid assignment is a broadcast cross-join + argmax (deterministic
  tie-break on lowest centroid id); search probes the nprobe nearest
  clusters so the corpus scan shrinks by ~ncentroids/nprobe.

All vector math uses built-in higher-order functions (zip_with +
aggregate) in double precision — JVM-side, codegen'd, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_brute(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of `query_id` by cosine. Output:
    (neighbor_id, rnk) with deterministic (cos desc, id) tie-break."""
    e = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    q = e.where(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    scored = (
        e.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine(F.col("v"), F.col("qv")).alias("cos"))
    )
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(F.col(id_col).alias("neighbor_id"), "rnk")
    )


def neardup_pairs_brute(
    emb: DataFrame,
    top_n: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: the top_n most similar distinct pairs
    (d1 < d2) corpus-wide. All-pairs — the small-SF correctness oracle;
    the scale path is neardup_pairs_lsh."""
    e = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    a = e.select(F.col(id_col).alias("d1"), F.col("v").alias("va"))
    b = e.select(F.col(id_col).alias("d2"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("d1") < F.col("d2")).select(
        "d1", "d2", cosine(F.col("va"), F.col("vb")).alias("cos")
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("d1"), F.col("d2"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_n)
        .select("d1", "d2", "rnk")
    )


def _rp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (sha256-seeded) so runs
    are reproducible without an RNG at plan time."""
    import hashlib
    import struct

    planes = []
    for p in range(n_planes):
        row: list[float] = []
        d = 0
        while len(row) < dim:
            h = hashlib.sha256(f"rp:{p}:{d}".encode()).digest()  # 32 bytes
            row.extend(
                struct.unpack(">q", h[i : i + 8])[0] / 2**63 for i in range(0, 32, 8)
            )
            d += 1
        planes.append(row[:dim])
    return planes


def neardup_pairs_lsh(
    emb: DataFrame,
    top_n: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-projection LSH near-dup: bucket by the sign pattern of
    n_planes projections, compare only within buckets (plus one-bit
    neighbor buckets via band split). At 100 TB the candidate set is
    |bucket|^2 summed, not N^2. Deterministic planes; rows-only check
    (no SQL analogue) — tests assert high overlap with brute force."""
    e = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    planes = _rp_planes(n_planes, dim)
    bits = [
        F.when(dot(F.col("v"), F.array(*[F.lit(x) for x in plane])) >= 0, 1).otherwise(0)
        for plane in planes
    ]
    # two bands of n_planes/2 bits: near-identical vectors agree on at
    # least one band with high probability
    half = n_planes // 2
    band0 = sum(b * (2**i) for i, b in enumerate(bits[:half]))
    band1 = sum(b * (2**i) for i, b in enumerate(bits[half:]))
    keyed = e.select(
        id_col, "v",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), band0.alias("bucket")),
                F.struct(F.lit(1).alias("band"), band1.alias("bucket")),
            )
        ).alias("bk"),
    ).select(id_col, "v", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    a = keyed.select(F.col(id_col).alias("d1"), F.col("v").alias("va"), "band", "bucket")
    b = keyed.select(F.col(id_col).alias("d2"), F.col("v").alias("vb"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "va", "vb")
        .dropDuplicates(["d1", "d2"])
    )
    scored = cand.select("d1", "d2", cosine(F.col("va"), F.col("vb")).alias("cos"))
    w = Window.orderBy(F.col("cos").desc(), F.col("d1"), F.col("d2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= top_n)
        .select("d1", "d2", "rnk")
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest 'centroid' (deterministically
    the first n_centroids vectors by id, standing in for trained k-means
    centers). Output: (vec_id, centroid_id)."""
    e = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    cent = e.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv")
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        F.col(id_col), F.col("cid"), cosine(F.col("v"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(id_col), F.col("cid").alias("centroid_id"))
    )


def ivf_search(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search: restrict the scan to the nprobe clusters nearest the
    query, then exact top-k within them. Output: (neighbor_id, rnk)."""
    assign = ivf_assign(emb, n_centroids, id_col, vec_col)
    e = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    q = e.where(F.col(id_col) == query_id).select(F.col("v").alias("qv"))
    cent = e.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv")
    )
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select("cid", cosine(F.col("cv"), F.col("qv")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
    )
    in_probe = assign.join(
        F.broadcast(probe), assign["centroid_id"] == probe["cid"], "left_semi"
    )
    scored = (
        e.join(in_probe, id_col, "left_semi")
        .where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine(F.col("v"), F.col("qv")).alias("cos"))
    )
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(F.col(id_col).alias("neighbor_id"), "rnk")
    )
