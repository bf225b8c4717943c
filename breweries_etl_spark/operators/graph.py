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


def bfs_levels(
    pairs: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """Unweighted BFS over the UNDIRECTED graph of ``pairs``: (node,
    level) with level = hop distance from the nearest source node.
    Unreached nodes are absent.

    Frontier-based: each round joins only the LAST round's newly-reached
    nodes against the edge list (anti-join drops already-visited), so
    total work is O(edges × diameter-reached-fraction), not O(edges ×
    rounds). First visit = minimum level (unweighted), so results are
    exact integers — deterministic under any partitioning, which is what
    lets a recursive-CTE oracle hash-match.

    Only the per-hop FRONTIER is checkpointed each round — the visited
    set is the lazy union of those already-checkpointed hop frames, so
    its lineage is one union over checkpoint scans and never deepens.
    Re-checkpointing the growing union every round (the naive pattern)
    rewrites the entire visited set to disk once per hop — O(nodes ×
    diameter) checkpoint I/O instead of O(nodes) total.

    ``sources``: one-column DataFrame of starting node ids (column
    ``node``).
    """
    # Persisted (not just checkpointed) because every hop re-joins the
    # full edge list — without the persist each round re-reads it from
    # the checkpoint files. Released before returning: the result plan
    # references only the per-hop checkpoint frames.
    edges = _checkpointed(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    ).persist()
    frontier = _checkpointed(
        sources.select("node").distinct().withColumn("level", F.lit(0))
    )
    hop_frames = [frontier]
    for hop in range(1, max_hops + 1):
        visited = hop_frames[0]
        for f in hop_frames[1:]:
            visited = visited.union(f)
        neighbors = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = _checkpointed(
            neighbors.join(visited, "node", "left_anti").withColumn(
                "level", F.lit(hop)
            )
        )
        if new.isEmpty():
            break
        hop_frames.append(new)
        frontier = new
    edges.unpersist()
    out = hop_frames[0]
    for f in hop_frames[1:]:
        out = out.union(f)
    return out


def _undirected(pairs: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    return (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )


def triangle_stats(
    pairs: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One-row global graph summary: node/edge/wedge/triangle counts and
    the global clustering coefficient (3·triangles / wedges, round-6).

    Triangle counting uses DEGREE-ORDERED ORIENTATION — each undirected
    edge is kept only in the direction of the (degree, id) total order,
    so every triangle {x,y,z} materializes exactly once as the directed
    path x→y→z closed by x→z. The payoff at scale: out-degree under
    this orientation is bounded by O(√m) regardless of how skewed the
    real degree distribution is, so the wedge-building self-join never
    explodes on hub nodes — the standard web-graph formulation (cf.
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11). A plain src<dst canonical orientation (what the
    DuckDB oracle uses — count-identical) would square on hubs.

    Wedges (paths of length 2) are Σ C(deg, 2) — one aggregate over the
    degree table, no join.
    """
    und = _undirected(pairs, src_col, dst_col).persist()
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    # keep (u,v) iff (deg_u, u) < (deg_v, v): one direction per edge
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        und.join(du, und.src == du.u)
        .join(dv, und.dst == dv.v)
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .persist()
    )
    e1 = oriented
    e2 = oriented.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = oriented.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    paths = e1.join(e2, e1.b == e2.b2).select("a", "b", "c")
    tri = paths.join(
        e3, (paths.a == e3.a3) & (paths.c == e3.c3)
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # per-node C(deg,2) via integer DIV (deg·(deg−1) is even) so the
        # sum never round-trips through a double
        F.sum(F.expr("deg * (deg - 1) DIV 2")).alias("n_wedges"),
    )
    n_edges = und.agg(F.expr("count(1) DIV 2").alias("n_edges"))
    out = (
        wedges.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering"),
        )
    )
    result = _checkpointed(out)
    for c in (oriented, deg, und):
        c.unpersist()
    return result


def pagerank(
    pairs: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after a fixed number of power iterations over the
    DIRECTED graph of ``pairs``, with dangling-node mass redistributed
    uniformly each round (ranks always sum to 1).

    Each round is one broadcast-or-shuffle join of (node, rank) against
    the edge list plus one aggregate — the rank frame is O(nodes), never
    the edges — and is reliably checkpointed to truncate lineage (same
    rationale as ``connected_components``). The dangling-mass term is a
    scalar aggregate collected per round; a driver scalar per iteration
    is inherent to power iteration, not a data collect.

    Rows-only for the driver gate (float accumulation order makes exact
    cross-engine hashing meaningless); pytest verifies against a dense
    numpy power iteration at 1e-9 and the Σrank=1 invariant.
    """
    edges = _checkpointed(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    )
    nodes = _checkpointed(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, ranks.node == out_deg.src, "left")
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        per_edge = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
        contribs = (
            with_deg.filter(F.col("out_deg").isNotNull())
            .join(per_edge, F.col("node") == F.col("e_src"))
            .select(
                F.col("e_dst").alias("t_node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("t_node")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = _checkpointed(
            nodes.join(contribs, nodes.node == contribs.t_node, "left").select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


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
