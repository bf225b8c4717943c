"""foreachBatch incremental MERGE sink: maintain a keyed "latest state"
table from a stream, with plain-Parquet snapshot-and-pointer atomicity.

This is the streaming materialized-view pattern the reference's
full-overwrite refreshes (ref: T/landing_to_bronze.py:177) can't reach:
each micro-batch merges into the served table instead of rebuilding it.
With Delta jars present you'd swap the snapshot write for MERGE INTO
(see sinks/writers.py's format toggle); the snapshot-plus-pointer layout
here gives the same reader-consistency contract with no table format:

- every epoch writes a COMPLETE new snapshot under ``v{epoch}/`` —
  idempotent on micro-batch replay (same epoch → same directory);
- ``_LATEST`` is repointed only after the snapshot commits, so readers
  never observe a partial table;
- the merge is LATEST-WINS BY EXPLICIT ORDER ``(order_cols, then key)``,
  not arrival order — so the final table is a pure function of the
  input set, deterministic under any micro-batch split or file order
  (what makes this sink oracle-checkable at all).

Scale notes: the per-epoch merge is one window over (key-partitioned)
snapshot ∪ batch — the same shuffle shape as the batch
``operators/merge.merge_upsert``. Snapshot rewrite is O(table) per
epoch; production would bucket the snapshot by key and rewrite only
touched buckets (or use Delta MERGE) — the merge plan itself is already
that incremental shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _latest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_LATEST")


def read_latest_snapshot(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """The currently-committed table, or None before the first epoch."""
    marker = _latest_path(table_dir)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="utf-8") as fh:
        version = fh.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def keep_latest_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """One row per key: the maximum under ``order_cols`` (descending,
    ties broken by the key — caller must make the order total)."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def streaming_latest_merge_sink(
    df: DataFrame,
    table_dir: str,
    key: str,
    order_cols: list[str],
    query_name: str = "latest_merge_sink",
):
    """Start an availableNow foreachBatch query that merges each
    micro-batch into the snapshot table (latest-wins per key)."""

    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_latest = keep_latest_per_key(batch_df, key, order_cols)
        current = read_latest_snapshot(spark, table_dir)
        merged = (
            batch_latest
            if current is None
            else keep_latest_per_key(
                current.unionByName(batch_latest), key, order_cols
            )
        )
        version = f"v{epoch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(table_dir, version))
        tmp = _latest_path(table_dir) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
        os.replace(tmp, _latest_path(table_dir))

    return (
        df.writeStream.outputMode("update")
        .foreachBatch(merge_epoch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def streaming_aggregate_merge_sink(
    df: DataFrame,
    table_dir: str,
    keys: list[str],
    count_col: str = "n",
    sum_col: str | None = None,
    sum_src: str | None = None,
    query_name: str = "aggregate_merge_sink",
):
    """Streaming MATERIALIZED-AGGREGATE maintenance: each micro-batch is
    aggregated down to per-key (count, decimal sum) partial state and
    monoid-merged into the snapshot table via
    ``operators.incremental.merge_aggregate_state`` — the streaming twin
    of the batch incremental-gold operator, with this sink's
    snapshot-and-pointer atomicity and idempotent epoch replay.

    Because count/sum are commutative monoids and the sums are exact
    decimals, the final snapshot is a pure function of the input SET —
    independent of micro-batch boundaries, arrival order, or replays —
    which is what lets a plain batch GROUP BY oracle the stream.

    At 100 TB the per-epoch merge shuffles only |keys| aggregated rows
    (never the raw events), exactly the property that makes streaming
    MV maintenance viable at all.
    """
    from ..operators.incremental import merge_aggregate_state

    def merge_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        aggs = [F.count(F.lit(1)).alias(count_col)]
        if sum_col is not None:
            aggs.append(
                F.sum(F.col(sum_src).cast("decimal(18,2)")).alias(sum_col)
            )
        delta = batch_df.groupBy(*keys).agg(*aggs)
        current = read_latest_snapshot(spark, table_dir)
        if current is None:
            merged = delta
        else:
            ops = {count_col: "sum"}
            if sum_col is not None:
                ops[sum_col] = "sum"
                # keep the merged sum in the same decimal type the delta
                # produces, so epoch N's snapshot schema is stable
                current = current.withColumn(
                    sum_col, F.col(sum_col).cast("decimal(18,2)")
                )
            merged = merge_aggregate_state(current, delta, keys, ops)
            if sum_col is not None:
                merged = merged.withColumn(
                    sum_col, F.col(sum_col).cast("decimal(18,2)")
                )
        version = f"v{epoch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(table_dir, version))
        tmp = _latest_path(table_dir) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(version)
        os.replace(tmp, _latest_path(table_dir))

    return (
        df.writeStream.outputMode("update")
        .foreachBatch(merge_epoch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_snapshots(table_dir: str, keep_last: int = 1) -> list[str]:
    """Remove superseded ``v{epoch}`` snapshot directories, never
    touching the committed one. Returns the removed directory names.

    Retention logic mirrors what a table format's VACUUM does, scoped
    to this sink's layout: the `_LATEST` pointer defines the committed
    snapshot; everything newer than it (a crashed epoch that wrote but
    never committed) and the ``keep_last`` most recent committed
    versions are kept; older versions are deleted. Readers holding the
    pointer already resolved their snapshot path, so deleting a
    superseded directory cannot break an in-flight read of the
    committed version — the same reasoning table formats use for
    retention windows.
    """
    import re
    import shutil

    marker = _latest_path(table_dir)
    if not os.path.exists(marker):
        return []
    with open(marker, encoding="utf-8") as fh:
        committed = int(fh.read().strip().lstrip("v"))
    removed = []
    for name in sorted(os.listdir(table_dir)):
        m = re.fullmatch(r"v(\d+)", name)
        if m and int(m.group(1)) <= committed - keep_last:
            shutil.rmtree(os.path.join(table_dir, name))
            removed.append(name)
    return removed
