"""Temporal operators over the events table: tumbling/sliding windows and
sessionization (SURVEY.md §2.10 extension — the reference has no
streaming/temporal operators; its `events`-shaped workloads are covered
here in batch, with streaming twins in streaming/events.py).

Window starts are emitted as epoch SECONDS (bigint): exact integer
arithmetic that matches any oracle engine regardless of timestamp
rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import money


def tumbling_counts(df: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling window aggregate via F.window — at scale this is a plain
    hash aggregation on (window, event_type); the window struct is
    computed per-row with no shuffle beyond the groupBy."""
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding window: each event lands in width/slide windows (4 here).
    F.window expands them inline (no join against a window table)."""
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_window_agg(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native ``F.session_window`` sessionization — same session
    boundaries as the window-based ``sessionize`` below (gap-merged), as
    a single hash aggregation instead of lag+cumsum windows. In
    Structured Streaming the identical expression maintains session state
    incrementally."""
    return (
        df.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select("user_id", "n_events", "start_us", "end_us", "total_value")
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: lag + cumulative-sum of gap breaks.

    Partitioned by user — the shuffle key is user_id, so a billion users
    parallelize; per-user event streams are assumed executor-sized
    (standard for clickstream sessionization; a single pathological user
    would need salted two-pass treatment).
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.unix_micros(F.col("ts"))).over(order)
    is_break = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(F.unix_micros(F.col("ts")) - prev_ts > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    with_session = df.withColumn("session_id", F.sum(is_break).over(order))
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            "start_us",
            "end_us",
            "total_value",
        )
    )
