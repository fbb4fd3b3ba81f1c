"""Iterative graph operators: connected components for duplicate-group
resolution.

Pair lists from minhash/simhash/embedding near-dup are EDGES; turning
"A~B, B~C" into one keep-group needs the transitive closure. The
classic Spark shape is iterative min-label propagation: each round every
node takes the minimum label among itself and its neighbors; rounds =
graph diameter (near-dup clusters are shallow, so 2-4 in practice).

Each round is one join + one groupBy, both shuffling on the node key;
intermediate labels are cached and the previous round explicitly
unpersisted, so state never accumulates. A convergence count() per
round is the driver-side fixpoint test (it doubles as the action that
materializes the cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    component is the smallest node id reachable through the undirected
    edge set."""
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    labels.count()
    for _ in range(max_iter):
        # message = neighbor's current label; new label = min(own, msgs)
        msgs = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("label").alias("nl"))
        )
        new_labels = (
            labels.unionByName(msgs.withColumnRenamed("nl", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select("node", F.col("label").alias("component"))
    # hand ownership of the final cache to the caller's plan; the loop's
    # intermediates are already unpersisted
    labels.unpersist()
    return out


def dedup_groups(
    pairs: DataFrame,
    id_col: str = "d1",
    id2_col: str = "d2",
) -> DataFrame:
    """(doc_id, keep_id): for every document in a near-dup pair, the
    canonical (minimum-id) member of its duplicate group. Feed any pair
    list (jaccard, minhash, simhash, embedding LSH); docs absent from
    `pairs` are their own canonical and need no row."""
    cc = connected_components(pairs, id_col, id2_col)
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("keep_id"))
