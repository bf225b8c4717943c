"""Entity resolution (record linkage): blocking → pairwise edit-distance
scoring → transitive clustering, the pipeline that deduplicates customer
/ vendor / author records where near-dup text dedup doesn't apply.

Scale design mirrors the dedup family:
- Candidate generation NEVER compares across blocks: records group by a
  cheap blocking key, each block's (id, name) structs collect into one
  sorted array, and pairs expand executor-locally via posexplode+slice
  (the same single-shuffle shape as dedup.bucket_candidate_pairs, but
  carrying the name alongside the id so scoring needs no join-back).
  Oversized blocks are dropped by cap, bounding the quadratic term.
- Scoring is native ``levenshtein`` — integer edit distance, JVM
  codegen, and defined identically in every engine, which is what makes
  the whole pipeline (not just the pair list) hash-checkable.
- Matched pairs cluster via graph.connected_components (min-label
  propagation with per-round reliable checkpoints); records that match
  nothing keep themselves as their entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components


def blocked_name_pairs(
    records: DataFrame,
    id_col: str = "record_id",
    name_col: str = "name",
    block_col: str = "block",
    max_block: int = 1000,
) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs WITH both names attached —
    one shuffle of (block, id, name) rows, pair expansion local."""
    buckets = (
        records.groupBy(block_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), F.col(name_col)))
            ).alias("recs")
        )
        .filter((F.size("recs") >= 2) & (F.size("recs") <= max_block))
    )
    pos = buckets.select(F.posexplode("recs").alias("_pos", "a"), "recs")
    return pos.select(
        F.col("a")[id_col].alias("id_a"),
        F.col("a")[name_col].alias("name_a"),
        F.explode(
            F.slice(F.col("recs"), F.col("_pos") + 2, F.size("recs"))
        ).alias("b"),
    ).select(
        "id_a",
        "name_a",
        F.col("b")[id_col].alias("id_b"),
        F.col("b")[name_col].alias("name_b"),
    )


def resolve_entities(
    records: DataFrame,
    id_col: str = "record_id",
    name_col: str = "name",
    block_col: str = "block",
    max_dist: int = 1,
    max_block: int = 1000,
) -> DataFrame:
    """(record_id, entity_id): entity_id is the minimum record id in the
    transitive closure of within-block pairs at edit distance ≤
    ``max_dist``; unmatched records are their own entity."""
    pairs = blocked_name_pairs(records, id_col, name_col, block_col, max_block).filter(
        F.levenshtein("name_a", "name_b") <= max_dist
    )
    comps = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")
    return (
        records.select(F.col(id_col).alias("record_id"))
        .join(comps, F.col("record_id") == comps.doc_id, "left")
        .select(
            "record_id",
            F.coalesce(F.col("cluster_id"), F.col("record_id")).alias("entity_id"),
        )
    )
