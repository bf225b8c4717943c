"""Aggregation operators (SURVEY.md §2.5 A1-A8).

The reference's entire gold layer is instances of one operator: group-by
row-count (ref: U/helpers.py:496-509). Spark's hash aggregate gives
partial (map-side) + final aggregation automatically, so the shuffle
carries one long per group per map task — the minimum possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def create_aggregation(
    df: DataFrame,
    group_by_columns: list[str],
    count_column_name: str = "count",
) -> DataFrame:
    """A1 — THE gold operator: count rows per key, keys kept as columns
    (ref: U/helpers.py:496-509)."""
    return df.groupBy(*group_by_columns).agg(F.count(F.lit(1)).alias(count_column_name))


def gold_aggregations(silver: DataFrame) -> dict[str, DataFrame]:
    """A2+A3 — the two fixed gold tables (ref: T/silver_to_gold.py:116-123).

    The reference computes them as two independent passes; ``by_location``
    is an exact rollup level of ``by_type_location``, so we derive it from
    the coarser aggregate instead of re-scanning silver — at 100 TB that
    saves a full second scan+shuffle (re-aggregating the small aggregate
    is ~free and arithmetic-exact for counts).
    """
    by_type_location = create_aggregation(
        silver, ["brewery_type", "location", "state", "city"], "brewery_count"
    )
    by_location = by_type_location.groupBy("location", "state", "city").agg(
        F.sum("brewery_count").alias("brewery_count")
    )
    return {"by_type_location": by_type_location, "by_location": by_location}


def value_counts(df: DataFrame, column: str, count_name: str = "count") -> DataFrame:
    """A6 — pandas ``value_counts`` (group-count, desc order)
    (ref: U/helpers.py:83-84)."""
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(F.desc(count_name), F.col(column))
    )


def row_count(df: DataFrame) -> DataFrame:
    """A7 — ``len(df)`` as a one-row frame (metrics/guards surface)."""
    return df.agg(F.count(F.lit(1)).alias("n_rows"))
