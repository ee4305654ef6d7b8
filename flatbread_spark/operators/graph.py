"""Graph operators for dedup post-processing.

Near-dup PAIRS (minhash/simhash/embedding output) are not directly actionable:
keeping "the lowest id of each pair" over-deletes when similarity chains
A~B~C. What a pipeline drops is one survivor per CONNECTED COMPONENT of the
pair graph — this module computes that assignment distributively.

Algorithm: iterative min-label propagation (the standard Pregel-style
connected components; cf. the large-star/small-star formulation of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).
State per iteration is one (node, label) row per node — each round is one
shuffle (join on edges + min-aggregate), converging in O(graph diameter)
rounds. Near-dup graphs have tiny diameters (chains of a few documents), so
3-5 rounds close virtually any real corpus; ``max_iter`` bounds the worst
case and convergence is detected with a per-round changed-label count
(an action per round — inherent to iterative fixpoints).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Assign every node the minimum node id reachable through ``edges``.

    Returns (``id_col``, cluster_id). Nodes absent from every edge keep
    themselves as cluster_id (singleton clusters). Deterministic: the label
    is a min over a set, independent of partitioning or iteration order.
    """
    labels = nodes.select(
        F.col(id_col).alias("__n"), F.col(id_col).alias("__lbl")
    )
    und = (
        edges.select(F.col(src_col).alias("__u"), F.col(dst_col).alias("__v"))
        .union(edges.select(F.col(dst_col).alias("__u"), F.col(src_col).alias("__v")))
        .distinct()
        .persist()
    )
    labels = labels.persist()
    try:
        for _ in range(max_iter):
            nbr = (
                und.join(labels, und["__v"] == labels["__n"])
                .select(F.col("__u").alias("__n"), "__lbl")
            )
            new_labels = (
                labels.unionByName(nbr)
                .groupBy("__n")
                .agg(F.min("__lbl").alias("__lbl"))
                .persist()
            )
            changed = (
                new_labels.alias("new")
                .join(labels.alias("old"), "__n")
                .filter(F.col("new.__lbl") != F.col("old.__lbl"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select(F.col("__n").alias(id_col), F.col("__lbl").alias("cluster_id"))
    finally:
        und.unpersist()


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster assignment + survivor flag from a near-dup pair list.

    Returns (``id_col``, cluster_id, is_survivor): the canonical "drop
    transitive duplicates, keep the lowest id per cluster" step downstream of
    any pair-producing dedup operator. One extra column, zero extra shuffles
    beyond :func:`connected_components` (survivor = id == cluster_id, since
    the cluster label IS the minimum member id).
    """
    cc = connected_components(
        df.select(id_col), pairs, id_col=id_col,
        src_col=src_col, dst_col=dst_col, max_iter=max_iter,
    )
    return cc.select(
        id_col, "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("is_survivor"),
    )
