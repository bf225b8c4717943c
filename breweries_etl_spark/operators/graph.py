"""Connected components over near-duplicate pair lists — the step that
turns pairwise dedup output into canonical document groups ("keep one
doc per near-dup cluster"), which is how web-scale corpora actually
apply MinHash/SimHash results.

Scale design: iterative min-label propagation. Each round is one
aggregate + one join over (node, label) pairs — never the documents —
and converges in O(cluster diameter) rounds; near-dup clusters are
shallow (a page and its variants), so 3-5 rounds is typical. Every
round eagerly (reliably) checkpoints the label frame: iterative plans
otherwise double in depth each pass and re-execute from the source
(lineage truncation is the standard Spark pattern for Pregel-style
loops; GraphX checkpoints periodically for the same reason). Reliable
checkpoints — not localCheckpoint — because they leave NOTHING pinned
in executor storage (localCheckpoint persists RDD blocks that
DataFrame.unpersist cannot release). The per-round convergence check is
one count() of changed labels — a driver action per iteration is
inherent to iterative algorithms, not a collect() of data.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _checkpointed(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark_graph_ckpt_"))
    return df.checkpoint(eager=True)


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id) for every node in ``pairs``, where cluster_id
    is the minimum node id in the component — deterministic on any
    partitioning."""
    edges = _checkpointed(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    current = _checkpointed(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iterations):
        # smallest label among each node's neighbors, then
        # keep min(own label, best neighbor label)
        neighbor_min = (
            edges.join(current, edges.dst == current.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = _checkpointed(
            current.join(neighbor_min, current.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        n_changed = updated.filter(F.col("changed")).count()
        current = updated
        if n_changed == 0:
            break
    return current.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def dedup_cluster_canonical(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Per-cluster summary of a near-dup pair list: the canonical
    (minimum-id) cluster label, the cluster size, and the member count
    to drop — the actionable output of a dedup campaign."""
    cc = connected_components(pairs, src_col, dst_col)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            (F.count(F.lit(1)) - 1).alias("n_to_drop"),
        )
        .orderBy("cluster_id")
    )
