"""Behavioral / product-analytics operators over the events stream:
ordered funnel conversion and cohort retention.

Both are single-key (user_id) aggregation pipelines: every stage keys by
user, so Catalyst reuses ONE hash partitioning across the chained
aggregations and joins — at 100 TB the events table shuffles on user_id
once, and the per-user intermediates (a handful of timestamps) are
negligible. No windows over the full stream, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered three-step funnel: users who did step1, then step2 AFTER
    their first step1, then step3 after that first qualifying step2.

    Formulated as chained conditional-min aggregations (not a per-user
    sort): t1 = first step1; t2 = first step2 ≥ t1; t3 = first step3 ≥ t2.
    Each stage is a groupBy(user) over a filtered projection joined to
    the previous stage's (user, t) pairs — all on the same shuffle key.

    Output: one row (n_step1, n_step2, n_step3) — funnel counts.
    """
    s1, s2, s3 = steps
    us = F.unix_micros(F.col("ts"))
    t1 = (
        df.where(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    t2 = (
        df.where(F.col("event_type") == s2)
        .select("user_id", us.alias("us"))
        .join(t1, "user_id")
        .where(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    t3 = (
        df.where(F.col("event_type") == s3)
        .select("user_id", us.alias("us"))
        .join(t2, "user_id")
        .where(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_step1"),
            F.count("t2").alias("n_step2"),
            F.count("t3").alias("n_step3"),
        )
    )


def retention_cohorts(df: DataFrame, max_offset_days: int = 30) -> DataFrame:
    """Classic cohort retention: users grouped by first-active day; for
    each (cohort_day, day_offset) count distinct users active that day.

    Days are epoch-day integers (``floor(us / 86400e6)``) — exact integer
    arithmetic, portable across engines and timezone-proof under the
    session's UTC posture.

    Scale: the events→first-day aggregation and the join both key on
    user_id (one shuffle); the final (cohort, offset) aggregation is a
    ~(days × offsets)-row result, map-side combined.
    """
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
    activity = df.select("user_id", day.alias("active_day")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .withColumn("day_offset", F.col("active_day") - F.col("cohort_day"))
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )
