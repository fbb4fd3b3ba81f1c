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
