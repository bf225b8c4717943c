"""Upsert / MERGE-INTO emulation and skew-safe aggregation.

The reference refreshes every layer with full overwrites
(ref: T/landing_to_bronze.py:177, T/bronze_to_silver.py:142) — fine for
8k rows, unusable at 100 TB. ``merge_upsert`` gives the incremental
alternative with plain Parquet semantics (Delta's MERGE INTO collapses to
this exact plan when its jars are absent): anti-join out the matched
target rows, union the updates.

``salted_group_count`` is the standard two-phase treatment for skewed
aggregation keys: pre-aggregate on (key, salt) so every reducer sees at
most ``buckets`` partial rows per hot key, then combine. AQE handles skew
in JOINs automatically; aggregation-side skew on low-cardinality keys
still benefits from explicit salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows in ``updates`` replace same-key rows in ``target``; unmatched
    target rows pass through. Equivalent to
    ``MERGE INTO target USING updates ON key WHEN MATCHED UPDATE *
    WHEN NOT MATCHED INSERT *`` for whole-row updates.

    One shuffle each side on ``key`` (the anti-join and the union share
    partitioning); updates are usually small → Catalyst broadcasts the
    anti-join build side automatically.
    """
    kept = target.join(updates, on=key, how="left_anti")
    return kept.unionByName(updates.select(*target.columns))


def scd2_close_and_append(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str = "version",
    is_current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: matched current rows are closed
    (is_current=false), updates append as the new current version."""
    prior = current.join(updates.select(key), on=key, how="left_semi").withColumn(
        is_current_col, F.lit(False)
    )
    untouched = current.join(updates.select(key), on=key, how="left_anti")
    max_version = (
        current.join(updates.select(key), on=key, how="left_semi")
        .groupBy(key)
        .agg(F.max(version_col).alias("__maxv"))
    )
    fresh = (
        updates.join(max_version, on=key, how="left")
        .withColumn(version_col, F.coalesce(F.col("__maxv") + 1, F.lit(1)))
        .drop("__maxv")
        .withColumn(is_current_col, F.lit(True))
    )
    return untouched.unionByName(prior).unionByName(fresh.select(*current.columns))


def salted_group_count(
    df: DataFrame, key: str, count_name: str = "count", buckets: int = 16
) -> DataFrame:
    """Two-phase skew-safe group count: identical result to
    ``groupBy(key).count()``, but the first shuffle distributes each hot
    key over ``buckets`` reducers.

    For plain counts Spark's map-side partial aggregation already blunts
    skew; salting matters when the aggregation state is heavy (distinct
    sets, collect_list) or when one key dominates entire executors.
    """
    salted = df.withColumn(
        "__salt", (F.abs(F.hash(F.monotonically_increasing_id())) % buckets)
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias(count_name))
