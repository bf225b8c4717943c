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


VALUE_TREND_BASE_S = 1_704_067_200  # 2024-01-01 UTC; any constant works


def value_trend(df: DataFrame, base_epoch_s: int = VALUE_TREND_BASE_S) -> DataFrame:
    """Per-user OLS slope of event value over time (value units/hour) —
    "is this user's spend trending up?" at population scale.

    Computed from EXACT component sums (integer seconds, decimal values):
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Integer/decimal sums are
    order-independent, so the result is bit-identical across partitioning
    degrees and engines (the ``corr``-from-exact-sums pattern). ``x`` is
    centered on a CONSTANT epoch base — slope is shift-invariant, and
    centering keeps Σx² inside 64-bit/decimal range for decade-scale
    spans.

    One hash aggregation on user_id; no window, no Python.
    """
    from ..functions.exact import money

    x = (F.unix_micros(F.col("ts")) / F.lit(1_000_000)).cast("long") - F.lit(
        base_epoch_s
    )
    y = money("value")
    agg = df.select(F.col("user_id"), x.alias("x"), y.alias("y")).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = (
        F.col("n").cast("decimal(38,2)") * F.col("sxy")
        - F.col("sx").cast("decimal(38,2)") * F.col("sy")
    )
    slope_per_hour = num.cast("double") / denom.cast("double") * F.lit(3600.0)
    return (
        agg.where(denom > 0)
        .select(
            "user_id",
            F.round(slope_per_hour, 6).alias("slope_per_hour"),
            F.col("n").alias("n_events"),
        )
    )


def value_trend_pandas(
    df: DataFrame, base_epoch_s: int = VALUE_TREND_BASE_S
) -> DataFrame:
    """Grouped-map ``applyInPandas`` twin of value_trend — the shape for
    per-group logic the built-ins can't express (model fits, scipy calls).
    Shares value_trend's oracle: rows are sorted inside the UDF and the
    component sums use Python ints / cent-scaled ints, so the arithmetic
    is exact and matches the JVM decimal path bit-for-bit after round-6.

    Scale: one shuffle on user_id, Arrow-batched; per-user groups must be
    executor-sized (same contract as any grouped-map)."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        x = (pdf["us"] // 1_000_000 - base_epoch_s).astype("int64")
        cents = (pdf["value"].round(2) * 100).round().astype("int64")
        n = len(pdf)
        sx, sy_c = int(x.sum()), int(cents.sum())
        sxy_c = int((x * cents).sum())
        sxx = int((x * x).sum())
        denom = n * sxx - sx * sx
        if denom <= 0:
            return pd.DataFrame(
                {"user_id": pd.array([], dtype="int64"),
                 "slope_per_hour": pd.array([], dtype="float64"),
                 "n_events": pd.array([], dtype="int64")}
            )
        num_c = n * sxy_c - sx * sy_c  # exact, in cent-seconds
        slope = round(num_c / 100.0 / denom * 3600.0, 6)
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])],
             "slope_per_hour": [slope],
             "n_events": [n]}
        )

    prepared = df.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandas(
        fit, schema="user_id long, slope_per_hour double, n_events long"
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


def top_event_paths(
    df: DataFrame,
    k: int = 20,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Most common 3-step behavior paths: per-user event sequences →
    sliding event-type trigrams → global counts, top-k (ties broken by
    path text so the result is reproducible). The path-mining primitive
    behind "what do users do before purchasing" questions.

    Scale shape: ONE window shuffle on user (two lead() reads off the
    same sorted run), then a map-side-combinable count; top-k is
    TakeOrderedAndProject, never a global sort.
    """
    from pyspark.sql import Window

    order = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)), tiebreak_col
    )
    tri = df.select(
        F.col(state_col).alias("s1"),
        F.lead(state_col, 1).over(order).alias("s2"),
        F.lead(state_col, 2).over(order).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        tri.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .select(
            F.concat_ws(" > ", "s1", "s2", "s3").alias("path"), "n_paths"
        )
        .orderBy(F.desc("n_paths"), "path")
        .limit(k)
    )


def rfm_segments(df: DataFrame, buckets: int = 4) -> DataFrame:
    """RFM segmentation of purchasers: recency (last purchase instant),
    frequency (purchase count), monetary (exact decimal spend) per user,
    each quartiled by ntile with a user-id tiebreak so bucket assignment
    is total-order deterministic — reproducible across engines and
    partitionings.

    Scale note: ntile needs a global order; at this output granularity
    (one row per USER, not per event) the ordered set is already small
    relative to the corpus. For billions of users swap ntile for
    percentile-threshold bucketing (two-pass: approx thresholds, then a
    scan-local CASE) — same output contract.
    """
    from pyspark.sql import Window

    from ..functions.exact import money

    per_user = (
        df.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_purchase_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(money("value")).cast("double").alias("monetary"),
        )
    )
    r_w = Window.orderBy(F.desc("last_purchase_us"), F.col("user_id"))
    f_w = Window.orderBy(F.desc("frequency"), F.col("user_id"))
    m_w = Window.orderBy(F.desc("monetary"), F.col("user_id"))
    return per_user.select(
        "user_id",
        "frequency",
        "monetary",
        F.ntile(buckets).over(r_w).cast("long").alias("r_bucket"),
        F.ntile(buckets).over(f_w).cast("long").alias("f_bucket"),
        F.ntile(buckets).over(m_w).cast("long").alias("m_bucket"),
    ).withColumn(
        "segment",
        F.concat_ws("-", "r_bucket", "f_bucket", "m_bucket"),
    )
