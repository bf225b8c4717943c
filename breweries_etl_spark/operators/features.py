"""Feature-store materialization: one wide per-entity feature frame
composed from the engine's behavioral operators — the table an ML
training job actually consumes. The point of the composition is
plan-level: every component keys by the same entity, so Catalyst plans
a chain of user-hash-partitioned aggregates/windows and the final
assembly is equi-joins on the shared key (AQE coalesces the tiny
sides); nothing rescans the fact table more than its own component
needs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import exact_mode
from .temporal import sessionize, time_weighted_value, user_activity_streaks


def user_feature_store(events: DataFrame) -> DataFrame:
    """Per-user wide feature row: volume, exact value total, session
    count, activity-streak stats, TWAP, modal event type, first/last
    active day. Every numeric is exact (decimal sums, integer days) or
    a fixed round-6 double — the frame is reproducible bit-for-bit
    across reruns and engines, which is what makes offline/online
    feature parity checkable at all.

    Plan note (r5 audit): the five feature families are independent
    sub-operators, each reading its own narrow projection of events —
    five column-pruned scans by design. They all aggregate on user_id,
    so the joins co-partition on one shuffle key; collapsing them into
    a single mega-aggregate would re-implement (and de-test) the
    individual operators to save scans a production feature store
    materializes separately anyway.
    """
    day = F.expr("unix_micros(ts) div 86400000000")
    base = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_value"),
        F.min(day).alias("first_day"),
        F.max(day).alias("last_day"),
    )
    sessions = (
        sessionize(events)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    streaks = user_activity_streaks(events).select(
        "user_id", "n_active_days", "max_streak_days"
    )
    twap = time_weighted_value(events).select("user_id", "twap")
    mode = exact_mode(events, "user_id", "event_type").select(
        "user_id", F.col("mode_value").alias("top_event_type")
    )
    return (
        base.join(sessions, "user_id")
        .join(streaks, "user_id")
        .join(twap, "user_id")
        .join(mode, "user_id")
    )
