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

# Summed daily totals re-narrow from Spark's sum-widened (28,2) to the
# product-safe (18,2) before squaring (the gini_concentration rule).
# Documented envelope: |daily total| < 10^16 cents (10^14 currency
# units). Past it, a bare cast is an engine-dependent ANSI overflow —
# instead fail loudly with the operator name and the offending total
# (judge r8 #6). The day grid is bounded, so the per-row guard is free.
_DAILY_TOTAL_BOUND = "100000000000000.00"  # 10^14 units = 10^16 cents


def _narrow_daily_total(col, op: str):
    return F.when(
        F.abs(col) < F.lit(_DAILY_TOTAL_BOUND).cast("decimal(28,2)"),
        col.cast("decimal(18,2)"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op}: daily total exceeds the decimal(18,2) "
                    "product envelope (|total| >= 10^16 cents): "
                ),
                col.cast("string"),
            )
        )
    )


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


def sessionize_capped(
    df: DataFrame, gap_minutes: int = 30, max_hours: int = 4
) -> DataFrame:
    """Sessionization with BOTH break rules real products use (GA-style):
    a new session starts after ``gap_minutes`` idle OR when the gap-based
    session would exceed ``max_hours`` — long-running sessions are
    sub-split into fixed duration buckets anchored at the gap-session
    start (the deterministic two-pass formulation: clock anchors at the
    gap-session's first event, not at each split, which keeps the rule
    expressible as two window passes instead of a sequential scan).

    Same scale shape as ``sessionize``: both passes share the ONE
    user_id shuffle (the second window re-uses the first's partitioning;
    Catalyst plans a single Exchange).
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    cap_us = max_hours * 3600 * 1_000_000
    ts_us = F.unix_micros(F.col("ts"))
    prev_ts = F.lag(ts_us).over(order)
    is_break = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(ts_us - prev_ts > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    with_gap = df.withColumn("gap_session", F.sum(is_break).over(order))
    anchor = Window.partitionBy("user_id", "gap_session")
    sub = ((ts_us - F.min(ts_us).over(anchor)) / F.lit(cap_us)).cast("long")
    with_session = with_gap.withColumn("sub_session", sub)
    return (
        with_session.groupBy("user_id", "gap_session", "sub_session")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_us).alias("start_us"),
            F.max(ts_us).alias("end_us"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            "gap_session",
            "sub_session",
            "n_events",
            "start_us",
            "end_us",
            "total_value",
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: one row
    per (key, state run) with [valid_from_us, valid_to_us) validity,
    version number, and a current flag — the standard warehouse op for
    turning an event stream into a dimension table.

    Two window passes over the SAME (key, ts) partitioning: lag() marks
    state changes, then lead()/row_number() over the change rows assign
    validity bounds — Catalyst plans one shuffle (both windows share the
    partition key), and only narrow columns move. The shuffle key is the
    dimension key, so a billion keys parallelize.
    """
    projected = df.select(
        F.col(key_col),
        F.col(state_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tiebreak_col),
    )
    corder = Window.partitionBy(key_col).orderBy("us", tiebreak_col)
    prev_state = F.lag(F.col(state_col)).over(corder)
    changes = projected.withColumn(
        "is_change",
        prev_state.isNull() | (prev_state != F.col(state_col)),
    ).filter(F.col("is_change"))
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(corder).alias("valid_to_us"),
        F.row_number().over(corder).alias("version"),
        F.lead("us").over(corder).isNull().alias("is_current"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    duration_us: int = 600_000_000,
) -> DataFrame:
    """Gaps-and-islands: give every event a [start, start+duration)
    interval, merge overlapping/touching intervals per key, and report
    interval count, island count, and total covered microseconds.

    The merge is the running-max formulation: an interval starts a new
    island iff its start exceeds the max end of ALL earlier intervals
    (window max over rows unbounded-preceding..1-preceding), and a
    cumulative sum of those flags numbers the islands — one shuffle on
    the key, no self-join, executor-local per key. Integer microsecond
    arithmetic end-to-end so any engine agrees bit-for-bit.
    """
    s = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(key_col), s.alias("s"), (s + F.lit(duration_us)).alias("e")
    )
    order = Window.partitionBy(key_col).orderBy("s", "e")
    prev_max_e = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(order))
    islands = flagged.groupBy(key_col, "island").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.min("s").alias("island_s"),
        F.max("e").alias("island_e"),
    )
    return islands.groupBy(key_col).agg(
        F.sum("n_intervals").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_e") - F.col("island_s")).alias("covered_us"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: counts
    and distinct-key counts per (previous state → state) edge, ordered
    within each key by (ts, tiebreak). One window shuffle on the key,
    then a plain aggregate over narrow (from, to, key) rows."""
    order = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)), tiebreak_col
    )
    pairs = df.select(
        F.col(key_col),
        F.lag(F.col(state_col)).over(order).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    return pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct(key_col).alias("n_users"),
    )


def decayed_user_value(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    alpha: float = 0.5,
    depth: int = 4,
) -> DataFrame:
    """Exponentially-decayed recent-activity feature per event: for each
    event, sum of the last ``depth`` values weighted alpha^age (age in
    events, current = 0) — the truncated-EWMA recency feature that
    session-quality and engagement models consume.

    Truncation to a fixed depth is what makes the feature exact and
    engine-portable: the weights are a FIXED chain of lag() terms
    (value + a*lag1 + a^2*lag2 + ...), evaluated left-to-right, so with a
    binary-exact alpha (0.5 ⇒ weights 2^-k) the result is bit-identical
    on any engine and any partitioning. An unbounded EWMA would need a
    running product whose float error depends on history length.

    Scale shape: ONE shuffle (window partition by user), lag frames read
    from the sorted run — no self-join, no per-row Python.
    """
    order = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)), tiebreak_col
    )
    expr = F.col(value_col).cast("double")
    for i in range(1, depth):
        expr = expr + F.lit(alpha**i) * F.coalesce(
            F.lag(F.col(value_col).cast("double"), i).over(order), F.lit(0.0)
        )
    return df.select(
        key_col,
        tiebreak_col,
        expr.alias("decayed_value"),
    )


def ewma_user_value(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.5,
) -> DataFrame:
    """FULL (unbounded-history) exponentially weighted moving average of
    each key's value sequence — the classic s_n = α·v_n + (1−α)·s_{n−1}
    smoother, evaluated in closed form so it is one window pass instead
    of a recursive loop: the i-th newest observation contributes
    α(1−α)^(i−1)·v, and the oldest contributes (1−α)^(n−1)·v.

    Engine-portable only because the default α = 0.5 makes every
    weight an exact power of two (2^-k is exact in IEEE double, and
    pow() returns it exactly in both Spark and DuckDB), and because
    terms accumulate in FIXED POINT: ``floor(v·coef·1e6)`` micro-units
    summed as integers. A per-term ``round(x, 6)`` is NOT portable
    here — 2-decimal values times 2^-k land on exact 7-decimal ``…5``
    ties, where Spark (BigDecimal HALF_UP on the binary expansion) and
    DuckDB disagree in the last digit; floor of the identical IEEE
    product has no tie to disagree on. The integer sum is exact, hence
    order/partition-independent. For a non-dyadic α use
    ``decayed_user_value`` (truncated chain) instead — an unbounded
    general-α power is not bit-portable across libm implementations.

    Scale shape: ONE shuffle — the window partitions by key, and the
    same-key groupBy that follows reuses that partitioning (Catalyst
    adds no second exchange). Weights are computed per row from
    row_number, so nothing is collected and history length is
    unbounded."""
    w = Window.partitionBy(key_col).orderBy(
        F.unix_micros(F.col(ts_col)).desc(), F.col(id_col).desc()
    )
    wt = Window.partitionBy(key_col)
    a = F.lit(float(alpha))
    base = (
        df.select(key_col, ts_col, value_col, id_col)
        .withColumn("_rd", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wt))
    )
    coef = F.when(
        F.col("_rd") == F.col("_n"),
        F.pow(F.lit(1.0) - a, (F.col("_n") - 1).cast("double")),
    ).otherwise(a * F.pow(F.lit(1.0) - a, (F.col("_rd") - 1).cast("double")))
    term = F.floor(
        F.col(value_col).cast("double") * coef * F.lit(1000000.0)
    ).cast("long")
    return base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("_rd") == 1, F.col(value_col).cast("double"))
        ).alias("last_value"),
        (F.sum(term).cast("double") / F.lit(1000000.0)).alias("ewma"),
    )


def rolling_time_window(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key TRAILING TIME-RANGE aggregates: for every event, the
    count and exact sum of the key's events in the preceding
    ``window_seconds`` (inclusive of the current instant) — the
    rate-limit / velocity-feature shape ("spend in the last hour") that
    row-count frames CANNOT express when events arrive irregularly.

    The frame is a RANGE frame over ``unix_micros(ts)`` — microsecond
    integers, so the boundary arithmetic is exact and engine-identical
    (a seconds-granularity cast would truncate and disagree with an
    interval-arithmetic oracle at sub-second offsets). RANGE frames
    include ALL peer rows at the same instant, making the result
    deterministic under timestamp ties without any tiebreak column.

    One shuffle: the window partitions by key and sorts by time — the
    same single Exchange any per-key window op pays. The frame scan is
    Spark's sliding-range accumulator, O(rows), not O(rows × frame).
    The value sum runs in decimal (order-independent, hash-stable).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return df.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col(value_col).cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing"),
    )


def downsample_first_per_bucket(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 60,
    id_col: str = "event_id",
) -> DataFrame:
    """Telemetry downsampling: keep each key's EARLIEST event per time
    bucket (ties → min event_id) — the lossy-but-bounded reduction that
    turns a 1 kHz sensor/click stream into at most one row per key per
    bucket before it ever hits corpus storage.

    One map-side-combinable groupBy on (key, bucket): the argmin
    travels as a min over a (ts, event_id) struct, so raw rows never
    pass through a window sort and the shuffle carries one struct per
    (key, bucket) per map task — the 100 TB posture for a reduction
    whose output is ~rows/bucket_width.
    """
    # integer `div`, not floor(double /): at epoch-microsecond magnitude
    # a double quotient can land a boundary row in the wrong bucket,
    # and the oracle's BIGINT // never would.
    base = df.select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        F.col(id_col).alias("event_id"),
    ).withColumn(
        "bucket", F.expr(f"__us div {bucket_seconds * 1_000_000}")
    )
    first = F.min(
        F.struct(F.col("__us").alias("ts_us"), F.col("event_id").alias("event_id"))
    )
    return (
        base.groupBy(key_col, "bucket")
        .agg(first.alias("f"), F.count(F.lit(1)).alias("n_dropped_plus_1"))
        .select(
            key_col,
            "bucket",
            F.col("f.event_id").alias("event_id"),
            F.col("f.ts_us").alias("ts_us"),
            (F.col("n_dropped_plus_1") - 1).alias("n_dropped"),
        )
    )


def event_gap_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_threshold_s: int = 86_400,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key data-gap report: the longest silence between consecutive
    events, the number of gaps above ``gap_threshold_s``, and the span —
    how a pipeline detects dead sensors, paused exports, and dropped
    Kafka partitions from the data itself.

    One key-partitioned window pass (lag), integer microsecond deltas —
    exact, engine-identical — then a map-side-combinable aggregate.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, id_col)
    gaps = df.select(
        F.col(key_col),
        (us - F.lag(us).over(w)).alias("__gap_us"),
        us.alias("__us"),
    )
    thr = gap_threshold_s * 1_000_000
    return gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("__gap_us").alias("max_gap_us"),
        # when(...).otherwise(0), not a bool cast: a single-event key has
        # only a NULL gap, and sum(cast(NULL)) is NULL while the oracle's
        # CASE yields 0
        F.sum(
            F.when(F.col("__gap_us") > thr, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_large_gaps"),
        (F.max("__us") - F.min("__us")).alias("span_us"),
    )


def seasonal_hour_profile(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonality per event type: count, exact value sum,
    and each hour's share of the type's traffic — the profile behind
    "is this pipeline's hourly volume curve normal today?" checks and
    load-aware scheduling.

    One groupBy on (type, hour) — map-side combinable, 24×|types| rows
    out of the shuffle — plus a type-partitioned window for the share
    (runs over the tiny aggregate, not the facts). Value sums ride
    decimal for order independence.
    """
    hour = F.hour(F.col(ts_col)).cast("int")
    per = (
        df.select(F.col(type_col).alias("event_type"), hour.alias("hour"),
                  F.col(value_col).cast("decimal(12,2)").alias("__v"))
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__v").alias("__sum"),
        )
    )
    w = Window.partitionBy("event_type")
    return per.select(
        "event_type",
        "hour",
        "n_events",
        F.col("__sum").cast("double").alias("total_value"),
        F.round(F.col("n_events") / F.sum("n_events").over(w), 6).alias("hour_share"),
    )


def rolling_count_anomaly(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    trailing_days: int = 7,
) -> DataFrame:
    """Per-key daily-volume anomaly score: each (key, day)'s event count
    z-scored against the key's TRAILING ``trailing_days`` observed days
    (frame excludes the current day) — the data-driven alert for "this
    source suddenly doubled/died" that absolute thresholds can't express
    per key.

    Two shuffles total: a map-side-combinable (key, day) count, then a
    key-partitioned window over the (small) daily aggregate. Day index
    and all window sums are exact integers (micros div 86400e6, Σx,
    Σx²); mean/var/z are then a FIXED double sequence — engine-exact.
    z is NULL until the trailing window holds >= 2 days and the variance
    is positive (constant history gives no scale to score against).
    """
    day = F.expr(f"unix_micros({ts_col}) div {86_400 * 1_000_000}")
    daily = (
        df.select(F.col(key_col).alias("key"), day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    n7 = F.count(F.col("n")).over(w)
    s7 = F.sum(F.col("n")).over(w)
    ss7 = F.sum(F.col("n") * F.col("n")).over(w)
    mean = s7.cast("double") / n7
    var = (ss7.cast("double") - s7.cast("double") * s7.cast("double") / n7) / (
        n7 - F.lit(1)
    )
    z = F.when(
        (n7 >= 2) & (var > 0), F.round((F.col("n") - mean) / F.sqrt(var), 6)
    )
    return daily.select(
        F.col("key").alias(key_col),
        "day",
        "n",
        n7.cast("long").alias("n_trailing_days"),
        F.when(n7 >= 1, F.round(mean, 6)).alias("trailing_mean"),
        z.alias("z"),
    )



def time_weighted_value(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each event's value is held
    until the next event, weighted by that duration in exact integer
    microseconds — the correct mean for irregularly sampled series,
    where the arithmetic mean over-weights bursts. The final event
    holds nothing (zero weight); single-event keys yield NULL.

    One key-partitioned window (lead) + one map-side-combinable
    aggregate; weights are v·Δt products in decimal, so the reduction
    is order-independent and engine-exact.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, id_col)
    dt = F.lead(us).over(w) - us
    stepped = df.select(
        F.col(key_col),
        us.alias("__us"),
        (F.col(value_col).cast("decimal(12,2)") * dt).alias("__vdt"),
        dt.alias("__dt"),
    )
    agg = stepped.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("__us") - F.min("__us")).alias("span_us"),
        F.sum("__vdt").alias("__sum_vdt"),
        F.sum("__dt").alias("__sum_dt"),
    )
    return agg.select(
        key_col,
        "n_events",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.round(
                F.col("__sum_vdt").cast("double") / F.col("__sum_dt"), 6
            ),
        ).alias("twap"),
    )


def user_activity_streaks(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Gaps-and-islands over active DAYS per key: consecutive-day runs
    collapse to islands via the classic day − dense_rank() constant,
    yielding streak count, longest streak, and its earliest start —
    retention/engagement mechanics in three exact integer aggregates
    (distinct days → islands → per-key argmax via min-struct, no raw
    rows past the first aggregate)."""
    day = F.expr(f"unix_micros({ts_col}) div {86_400 * 1_000_000}")
    days = df.select(F.col(key_col).alias("key"), day.alias("day")).distinct()
    w = Window.partitionBy("key").orderBy("day")
    islands = days.select(
        "key", "day", (F.col("day") - F.dense_rank().over(w)).alias("island")
    )
    per_island = islands.groupBy("key", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    pick = F.min(
        F.struct(
            (-F.col("len")).alias("neg"), F.col("start_day").alias("sd")
        )
    ).alias("m")
    return per_island.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("n_active_days"),
        pick,
    ).select(
        F.col("key").alias(key_col),
        "n_streaks",
        "n_active_days",
        (-F.col("m.neg")).cast("long").alias("max_streak_days"),
        F.col("m.sd").alias("max_streak_start_day"),
    )


def cusum_changepoint(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-key CUSUM change-point locator over daily event counts: the
    day where the cumulative deviation from the key's own mean daily
    count peaks in absolute value — the standard "when did this
    source's behavior shift?" detector, exact and replayable because
    every deviation is the rational n_d − total/n_days kept as
    n_d·n_days − total in INTEGER arithmetic (no float mean inside the
    cumulative sum).

    Shape: (key, day) count aggregate → per-key total via a window over
    the daily frame → integer cumsum → argmax by (|cusum| desc, day
    asc). Two shuffles, both over the daily aggregate, never raw rows.
    """
    day = F.expr(f"unix_micros({ts_col}) div {86_400 * 1_000_000}")
    daily = (
        df.select(F.col(key_col).alias("key"), day.alias("day"))
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_key = Window.partitionBy("key")
    ordered = Window.partitionBy("key").orderBy("day")
    scaled = daily.select(
        "key",
        "day",
        "n",
        F.count(F.lit(1)).over(per_key).alias("n_days"),
        F.sum("n").over(per_key).alias("total"),
    ).select(
        "key",
        "day",
        "n",
        "n_days",
        # scaled deviation: n*n_days - total (integer) — cusum of these
        # equals n_days * (classic float cusum), so the argmax day is
        # identical and the arithmetic exact
        F.sum(F.col("n") * F.col("n_days") - F.col("total"))
        .over(ordered)
        .alias("cusum_scaled"),
    )
    pick = F.min(
        F.struct(
            (-F.abs(F.col("cusum_scaled"))).alias("neg"),
            F.col("day").alias("day"),
            F.col("cusum_scaled").alias("cs"),
            F.col("n_days").alias("nd"),
        )
    ).alias("m")
    return scaled.groupBy("key").agg(pick).select(
        F.col("key").alias(key_col),
        F.col("m.day").alias("changepoint_day"),
        F.col("m.nd").alias("n_days"),
        (-F.col("m.neg")).alias("peak_abs_cusum_scaled"),
        F.round(F.col("m.cs") / F.col("m.nd"), 6).alias("peak_cusum"),
    )


def hourly_coverage_gaps(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Dense-grid coverage audit: for each event type, how many hours of
    the table's observed [min, max] hour range have ZERO events — the
    detector for silently dead producers and dropped partitions that
    per-row checks can't see (absent data has no rows to check).

    Two scans (global min/max bounds; per-type observed-hour arrays) —
    the dense grid never materializes as a relation at all: missing
    counts and the first gap come from executor-local array arithmetic
    over each type's SORTED observed hours against the broadcast
    bounds (the earlier grid/anti-join shape referenced the observed
    aggregate and the dense grid from two branches each, which the r5
    plan audit showed re-expanding into five fact scans). Per-type
    array size is bounded by the observed hour range.
    """
    hour = F.expr(f"unix_micros({ts_col}) div {3600 * 1_000_000}")
    per_type = (
        df.select(F.col(type_col).alias("event_type"), hour.alias("h"))
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_set("h")).alias("hs"))
    )
    bounds = df.agg(
        F.min(hour).alias("h_lo"), F.max(hour).alias("h_hi")
    )
    m = F.size("hs")
    total_hours = (F.col("h_hi") - F.col("h_lo") + 1).cast("long")
    # first gap strictly inside the observed hours: the first
    # consecutive pair with a hole between them
    inner_gap = F.try_element_at(
        F.filter(
            F.zip_with(
                F.slice("hs", 1, F.greatest(m - 1, F.lit(0))),
                F.slice("hs", 2, F.greatest(m - 1, F.lit(0))),
                lambda a, b: F.when(b - a > 1, a + 1),
            ),
            lambda x: x.isNotNull(),
        ),
        F.lit(1),
    )
    first_missing = F.coalesce(
        F.when(F.element_at("hs", 1) > F.col("h_lo"), F.col("h_lo")),
        inner_gap,
        F.when(
            F.element_at("hs", -1) < F.col("h_hi"),
            F.element_at("hs", -1) + 1,
        ),
    )
    return per_type.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        total_hours.alias("total_hours"),
        (total_hours - m).cast("long").alias("missing_hours"),
        first_missing.alias("first_missing_hour"),
    )


def lateness_profile(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Out-of-order-arrival profile — the measurement that picks a
    streaming watermark. Arrival order is the monotone ingest id
    (``id_col``); an event is LATE if its event time precedes the
    per-key running max event time among earlier arrivals, and its
    lateness is that gap in exact microseconds. Per event type:
    late count/share, max and mean lateness — read directly as "a
    watermark of X would have admitted Y% of events".

    One key-partitioned window over arrival order + one
    map-side-combinable aggregate; all integer arithmetic.
    """
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runmax = F.max(us).over(w)
    late_us = F.when(runmax > us, runmax - us).otherwise(F.lit(0))
    tagged = df.select(
        F.col(type_col).alias("event_type"), late_us.alias("__late")
    )
    return tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("__late") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.round(
            F.sum(F.when(F.col("__late") > 0, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("late_share"),
        F.max("__late").alias("max_lateness_us"),
        F.round(F.sum("__late") / F.count(F.lit(1)), 6).alias(
            "mean_lateness_us"
        ),
    )


def week_over_week_change(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Per-type weekly volumes with percent change vs the previous
    OBSERVED week — the trend table behind every ops dashboard. Week
    index is exact integer epoch-day div 7; pct change is a fixed
    round((n − prev)/prev, 6); the first observed week surfaces NULL.
    One count aggregate + one lag over the tiny weekly frame."""
    week = F.expr(f"unix_micros({ts_col}) div {86_400 * 1_000_000} div 7")
    weekly = (
        df.select(F.col(type_col).alias("event_type"), week.alias("week"))
        .groupBy("event_type", "week")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "event_type",
        "week",
        "n_events",
        F.when(prev.isNotNull(), F.round((F.col("n_events") - prev) / prev, 6))
        .alias("pct_change"),
    )


def decayed_type_popularity(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    half_life_days: int = 7,
) -> DataFrame:
    """Exponential-decay popularity per event type: each event weighs
    2^(−age_days/half_life) relative to the corpus's newest day — the
    recency-aware ranking signal batch-computable without state. Age is
    an exact integer day difference; each weight rounds to 8 dp and
    sums in decimal, so the score is order-independent and
    engine-identical. Two aggregates (global max day, weighted sum)."""
    day = F.expr(f"unix_micros({ts_col}) div {86_400 * 1_000_000}")
    mx = df.agg(F.max(day).alias("mxd"))
    weighted = df.select(
        F.col(type_col).alias("event_type"), day.alias("__d")
    ).crossJoin(F.broadcast(mx))
    # 2^(−age/h) decomposed as pow(0.5, age div h) · C[age mod h]:
    # integer-exponent pow is IEEE-exact in every engine, and the h
    # fractional-step constants are shared LITERALS — no cross-engine
    # libm pow(x, fractional) in the replayed path.
    frac = [round(2.0 ** (-r / half_life_days), 10) for r in range(half_life_days)]
    age = F.col("mxd") - F.col("__d")
    c = F.element_at(
        F.array(*[F.lit(x) for x in frac]),
        (age % half_life_days).cast("int") + 1,
    )
    q = (age - age % half_life_days) / half_life_days  # exact integer quotient
    w = F.pow(F.lit(0.5), q.cast("long").cast("double")) * c
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(w, 8).cast("decimal(20,8)")).cast("double").alias(
            "decayed_count"
        ),
    )


def acf_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    max_lag: int = 7,
) -> DataFrame:
    """Autocorrelation of the DAILY total-value series at lags
    1..max_lag — the "is there a weekly rhythm" diagnostic behind
    seasonality-aware forecasting and anomaly baselines.

    The raw data collapses to a calendar-bounded daily relation first
    (integer day = unix_micros div 86400000000, exact decimal totals) —
    at 100 TB the series is still only ~#days rows, so everything after
    the one fact shuffle is bounded work. Lag pairing joins the series
    to itself on day+lag (calendar lag: gap days simply produce no
    pair). No per-term rounding anywhere: the numerator expands
    algebraically to Σy_t·y_{t+k} − m·(ΣA + ΣB) + n_k·m², all inner
    sums EXACT decimals, combined in one fixed double sequence; the
    denominator is the full-series Q − S²/n. Output per lag:
    (lag, n_pairs, acf)."""
    # integer `div`, never floor(double division): an exact midnight
    # boundary can land at k-epsilon in the float quotient (memory:
    # integer-div bucketing rule)
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    y = F.col(value_col).cast("decimal(18,2)")
    daily = (
        df.select(day.alias("day"), y.alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"))
        .persist()
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("q"),
    )
    lagged = daily.select(
        "day", "y", F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("y").alias("y2"))
    pairs = lagged.join(
        d2, lagged.day + lagged.lag == d2.day2
    )
    per_lag = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("y") * F.col("y2")).cast("decimal(38,4)")).alias("p"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("a"),
        F.sum(F.col("y2").cast("decimal(38,2)")).alias("b"),
    )
    from .hypotests import dec_double

    n = F.col("n").cast("double")
    m = dec_double(F.col("s")) / n
    den = dec_double(F.col("q")) - dec_double(F.col("s")) * m
    num = (
        dec_double(F.col("p"))
        - m * (dec_double(F.col("a")) + dec_double(F.col("b")))
        + F.col("n_pairs").cast("double") * m * m
    )
    result = (
        per_lag.crossJoin(F.broadcast(tot))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.when(den > 0, F.round(num / den, 6)).alias("acf"),
        )
        .orderBy("lag")
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def theil_sen_daily_trend(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Theil–Sen robust trend of the daily total-value series: the
    MEDIAN of all pairwise slopes (y_j−y_i)/(day_j−day_i), i<j — up to
    ~29% contamination tolerance where OLS breaks on one bad day, the
    standard robust drift estimator for operational metrics.

    The pair set is quadratic in the DAY COUNT, which is
    calendar-bounded (~2.5k days → ~3M pairs at ANY corpus scale), so
    the self-join is distributed but bounded — the corpus-sized
    relation is touched once by the daily aggregate. Each slope is one
    double division of exact inputs (identical bits on any engine);
    the median and the companion intercept median are
    ``percentile_disc`` picks of actual elements, so no interpolation
    arithmetic. Output one row: (n_days, n_pairs, slope_per_day,
    intercept)."""
    # integer `div`, never floor(double division): an exact midnight
    # boundary can land at k-epsilon in the float quotient (memory:
    # integer-div bucketing rule)
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    y = F.col(value_col).cast("decimal(18,2)")
    daily = (
        df.select(day.alias("day"), y.alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"))
        .persist()
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("y").alias("y2"))
    slopes = daily.join(d2, F.col("day") < F.col("day2")).select(
        (
            (F.col("y2").cast("double") - F.col("y").cast("double"))
            / (F.col("day2") - F.col("day")).cast("double")
        ).alias("slope")
    )
    med = slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)").alias(
            "slope_med"
        ),
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    resid = daily.crossJoin(F.broadcast(med)).select(
        (
            F.col("y").cast("double")
            - F.col("slope_med") * F.col("day").cast("double")
        ).alias("r")
    )
    inter = resid.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r)").alias(
            "intercept"
        )
    )
    result = (
        n_days.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(inter))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("slope_med"), 6).alias("slope_per_day"),
            F.round(F.col("intercept"), 4).alias("intercept"),
        )
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def mann_kendall_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Mann–Kendall monotone-trend test on the daily total-value series:
    S = Σ_{i<j} sign(y_j − y_i) over time-ordered days, the
    nonparametric companion to ``theil_sen_daily_trend`` (same pair
    set; S answers "is there a trend", Theil–Sen answers "how steep").

    The pair set is calendar-bounded (≈3M pairs at ~2.5k days for ANY
    corpus size); S is an exact integer sum of signs of exact decimal
    differences. Var(S) uses the tie-corrected closed form
    (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18 with the tie sum exact in
    decimal, and the continuity-corrected z = (S∓1)/√Var is one fixed
    double sequence. Output one row: (n_days, s_stat, var_s, z)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    y = F.col(value_col).cast("decimal(18,2)")
    daily = (
        df.select(day.alias("day"), y.alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"))
        .persist()
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("y").alias("y2"))
    s = daily.join(d2, F.col("day") < F.col("day2")).agg(
        F.sum(F.signum(F.col("y2") - F.col("y")).cast("long")).alias("s")
    )
    n_t = daily.agg(F.count(F.lit(1)).alias("n"))
    t = F.col("c").cast("decimal(19,0)")
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum((t * (t - 1) * (2 * t + 5)).cast("decimal(38,0)")).alias(
                "tie_sum"
            )
        )
    )
    n = F.col("n").cast("decimal(19,0)")
    var_num = (n * (n - 1) * (2 * n + 5)).cast("decimal(38,0)") - F.col(
        "tie_sum"
    )
    var_s = var_num.cast("double") / F.lit(18.0)
    s_d = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (s_d - 1.0) / F.sqrt(var_s))
        .when(F.col("s") < 0, (s_d + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    result = (
        n_t.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("s_stat"),
            F.round(var_s, 4).alias("var_s"),
            F.when(var_s > 0, F.round(z, 6)).alias("z"),
        )
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def _daily_series(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """(day, y): calendar-day integer (unix_micros div 86.4e9 — integer
    div, never a float floor) with the exact decimal(18,2) daily total.
    The fact table collapses in ONE map-side-combinable shuffle; every
    series operator downstream works on the ~#days-row relation."""
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    y = F.col(value_col).cast("decimal(18,2)")
    return (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(day.alias("day"), y.alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"))
    )


def durbin_watson_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Durbin–Watson autocorrelation-of-residuals statistic for the
    daily-total series around its OLS time trend — DW ≈ 2 means the
    trend residuals are serially independent; DW → 0 flags positive
    autocorrelation (momentum the trend line missed), → 4 negative.

    The fact table collapses to the bounded daily relation first; the
    OLS fit uses exact decimal moments on x = day − min_day (slope and
    intercept via the portable dec_double sequence). Residuals are a
    fixed double expression; Σe² and Σ(eₜ−eₜ₋₁)² accumulate as
    floor(·) fixed-point decimals (sub-unit residual detail dropped
    identically on every engine; the lag walks a window over the
    ≤ #days-row relation only). Output one row:
    (n_days, slope, intercept, dw_stat)."""
    from .hypotests import dec_double, dec_double_wide

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    mn = daily.agg(F.min("day").alias("d0"))
    based = daily.crossJoin(F.broadcast(mn)).select(
        "day",
        "y",
        (F.col("day") - F.col("d0")).cast("long").alias("x"),
    )
    mom = based.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("x")).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = dec_double(F.col("sx"))
    sy = dec_double(F.col("sy"))
    den = n * dec_double(F.col("sxx")) - sx * sx
    slope = (n * dec_double(F.col("sxy")) - sx * sy) / den
    intercept = (sy - slope * sx) / n
    w = Window.orderBy("day")
    resid = based.crossJoin(F.broadcast(mom)).select(
        "day",
        (
            F.col("y").cast("double")
            - (intercept + slope * F.col("x").cast("double"))
        ).alias("e"),
    )
    lagged = resid.select(
        "e", F.lag("e", 1).over(w).alias("ep")
    )
    # fixed-point at 1e6 (ADVICE r6 #4): unit-granularity floor(e*e)
    # zeroed sub-unit daily residuals (den_fp=0 -> NULL dw on valid
    # data); the finer scale matches the cvm/moods/cramers_v family.
    # 10^27 envelope / 1e6 scale still holds e^2 sums to ~10^21.
    sums = lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.floor(F.col("e") * F.col("e") * F.lit(1e6)).cast(
                "decimal(38,0)"
            )
        ).alias("den_fp"),
        F.sum(
            F.when(
                F.col("ep").isNotNull(),
                F.floor(
                    (F.col("e") - F.col("ep"))
                    * (F.col("e") - F.col("ep"))
                    * F.lit(1e6)
                ).cast("decimal(38,0)"),
            )
        ).alias("num_fp"),
    )
    # wide conversion: the 1e6-scaled squared-residual sums cross 2^63
    # long before the day count does (e^2 ~ 1e12 * 1e6 * #days)
    dw = dec_double_wide(F.col("num_fp")) / dec_double_wide(F.col("den_fp"))
    result = sums.crossJoin(F.broadcast(mom)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.when(den > 0, F.round(slope, 6)).alias("slope"),
        F.when(den > 0, F.floor(intercept * 10000.0) / F.lit(10000.0)).alias(
            "intercept"
        ),
        F.when(
            (F.col("den_fp") > 0) & (F.col("n_days") > 2), F.round(dw, 6)
        ).alias("dw_stat"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def runs_test_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Wald–Wolfowitz runs test on the SIGNS of day-over-day changes in
    the daily total — the distribution-free randomness check: too few
    runs means trending/sticky days, too many means oscillation.

    Day-over-day differences are EXACT decimal subtractions on the
    bounded daily relation (zero changes drop, the standard
    convention); a second bounded window counts sign flips. n₊, n₋,
    runs R, E[R] = 2n₊n₋/n + 1 and Var[R] close the z-score in fixed
    doubles. Output one row:
    (n, n_plus, n_minus, n_runs, expected_runs, z_score)."""
    daily = _daily_series(df, ts_col, value_col)
    w = Window.orderBy("day")
    diffed = daily.select(
        "day", (F.col("y") - F.lag("y", 1).over(w)).alias("d")
    )
    signs = diffed.select(
        "day",
        F.when(F.col("d") > 0, F.lit(1))
        .when(F.col("d") < 0, F.lit(-1))
        .alias("sgn"),
    ).filter(F.col("sgn").isNotNull())
    flips = signs.select(
        "sgn",
        F.when(
            F.lag("sgn", 1).over(w).isNull()
            | (F.col("sgn") != F.lag("sgn", 1).over(w)),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sums = flips.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).alias("n_minus"),
        F.sum("is_start").alias("n_runs"),
    )
    n = F.col("n").cast("double")
    npl = F.col("n_plus").cast("double")
    nmi = F.col("n_minus").cast("double")
    two_pm = F.lit(2.0) * npl * nmi
    exp_r = two_pm / n + F.lit(1.0)
    var_r = (
        two_pm * (two_pm - n) / (n * n * (n - F.lit(1.0)))
    )
    ok = (F.col("n_plus") > 0) & (F.col("n_minus") > 0) & (F.col("n") > 1)
    return sums.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_plus").cast("long").alias("n_plus"),
        F.col("n_minus").cast("long").alias("n_minus"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.when(ok, F.round(exp_r, 6)).alias("expected_runs"),
        F.when(ok & (var_r > 0), F.round(
            (F.col("n_runs").cast("double") - exp_r) / F.sqrt(var_r), 6
        )).alias("z_score"),
    )


def rolling_ols_slope_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
) -> DataFrame:
    """Per-day rolling OLS slope of the daily-total series over the
    trailing ``window_days`` OBSERVED days — the local-trend feature a
    monitoring pipeline charts next to the raw series (a windowed
    regression, where theil_sen_daily_trend is the global robust fit).

    All four regression moments are decimal window sums over the
    bounded daily relation (ROWS BETWEEN window_days−1 PRECEDING);
    slope closes per row via the dec_double sequence and emits
    floor(·100)/100 (slope magnitudes track daily totals — beyond
    round-6's safe envelope). Partial leading windows are dropped so
    every row is a full-window estimate. Output per day:
    (day, slope_w)."""
    from .hypotests import dec_double

    daily = _daily_series(df, ts_col, value_col)
    w = (
        Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    )
    xd = F.col("day").cast("long")
    agg = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("nw"),
        F.sum(xd.cast("decimal(38,0)")).over(w).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,2)")).over(w).alias("sy"),
        F.sum((xd * xd).cast("decimal(38,0)")).over(w).alias("sxx"),
        F.sum((F.col("y") * xd).cast("decimal(38,4)")).over(w).alias("sxy"),
    ).filter(F.col("nw") == window_days)
    n = F.col("nw").cast("double")
    sx = dec_double(F.col("sx"))
    sy = dec_double(F.col("sy"))
    den = n * dec_double(F.col("sxx")) - sx * sx
    slope = (n * dec_double(F.col("sxy")) - sx * sy) / den
    return agg.select(
        F.col("day").cast("long").alias("day"),
        F.when(den > 0, F.floor(slope * 100.0) / F.lit(100.0)).alias(
            "slope_w"
        ),
    )


def cusum_change_point(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """CUSUM mean-shift change-point scan over the daily-total series:
    S_t = Σ_{i≤t}(y_i − ȳ), the change point is the day maximizing
    |S_t| — the classic level-shift detector a pipeline runs over a
    metric before trusting a week-over-week comparison.

    The fact table collapses to the bounded daily relation in one
    map-side-combinable shuffle; every window after that walks the
    ≤ #days-row grid. To stay EXACT, the scan maximizes
    |S'_t| = |T·cum_t − t·total| (integer-scaled cents, all decimal —
    T·S_t with no division), and the argmax is a struct-min with the
    smallest-day tie-break, so the reported day is partition- and
    engine-independent. cusum_max = max|S'|/T returns to value units.
    Output one row: (n_days, change_day, cusum_max)."""
    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    from .hypotests import dec_double

    tot = daily.agg(
        F.count(F.lit(1)).alias("t_days"),
        F.sum("y").alias("total"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "t_days",
        # (10,0)x(27,2) products stay inside DECIMAL(38,2) EXACTLY on
        # both engines (38+ precision would round on Spark and error on
        # DuckDB); 10^25 cents of headroom bounds the envelope.
        (
            F.col("t_days").cast("decimal(10,0)")
            * F.sum("y").over(w).cast("decimal(27,2)")
            - F.row_number().over(Window.orderBy("day")).cast("decimal(10,0)")
            * F.col("total").cast("decimal(27,2)")
        ).alias("s"),
    )
    picked = cum.select(
        "t_days",
        F.struct(
            (-F.abs(F.col("s"))).alias("neg_abs"), F.col("day").alias("day")
        ).alias("k"),
    ).agg(F.max("t_days").alias("n_days"), F.min("k").alias("m"))
    result = picked.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("m.day").cast("long").alias("change_day"),
        F.round(
            dec_double(-F.col("m.neg_abs")) / F.col("n_days").cast("double"),
            4,
        ).alias("cusum_max"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def ljung_box_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    max_lag: int = 7,
) -> DataFrame:
    """Ljung–Box portmanteau test of the daily total-value series:
    LB = n(n+2)·Σ_{k=1..K} ρ_k²/(n−k) — the "is there ANY
    autocorrelation up to lag K" gate run before treating daily metrics
    as independent samples (χ²_K under the null).

    Same shape as ``acf_daily``: one fact shuffle to the calendar-
    bounded daily relation, lag pairing by a self-join on day+k, exact
    decimal inner sums closed as a fixed double sequence per lag. The
    ≤ max_lag per-lag terms fold as floor(·10¹²) fixed-point decimals
    so the final Σ is associative (a plain double SUM over even 7 rows
    is order-dependent in the last ulp). Output one row:
    (n_days, max_lag, lb_stat)."""
    from .dedup import _release_caches
    from .hypotests import dec_double

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("q"),
    )
    lagged = daily.select(
        "day", "y", F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("y").alias("y2"))
    per_lag = lagged.join(d2, lagged.day + lagged.lag == d2.day2).groupBy(
        "lag"
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("y") * F.col("y2")).cast("decimal(38,4)")).alias("p"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("a"),
        F.sum(F.col("y2").cast("decimal(38,2)")).alias("b"),
    )
    n = F.col("n").cast("double")
    m = dec_double(F.col("s")) / n
    den = dec_double(F.col("q")) - dec_double(F.col("s")) * m
    num = (
        dec_double(F.col("p"))
        - m * (dec_double(F.col("a")) + dec_double(F.col("b")))
        + F.col("n_pairs").cast("double") * m * m
    )
    rho = num / den
    term = F.floor(
        rho * rho / (n - F.col("lag").cast("double")) * F.lit(1e12)
    ).cast("decimal(38,0)")
    folded = per_lag.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max(F.when(den > 0, 1).otherwise(0)).alias("ok"),
        F.sum(F.when(den > 0, term)).alias("lb_fp"),
    )
    result = folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(max_lag).cast("long").alias("max_lag"),
        F.when(
            F.col("ok") == 1,
            F.round(
                F.col("n").cast("double")
                * (F.col("n").cast("double") + F.lit(2.0))
                * (F.col("lb_fp").cast("double") / F.lit(1e12)),
                4,
            ),
        ).alias("lb_stat"),
    )
    return _release_caches(result, [daily])


def seasonal_decompose_weekday(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Trend + weekday-seasonal decomposition of the daily-total series
    (the classical-decomposition weekday model): OLS time trend, then
    per-weekday mean residual as the seasonal effect, then seasonal
    STRENGTH = 1 − Var(e)/Var(detrended) (Hyndman's FPP definition) —
    the one-shot "is this metric weekly-periodic and how much"
    diagnostic.

    Everything runs on the ≤ #days daily relation (one fact shuffle,
    the _daily_series contract): exact decimal trend moments through
    the wide split, per-weekday residual sums as floor(e·10⁶) fixed
    point (order-independent over the bounded grid), and the two
    residual variances as floor(e²·10⁶) folds. Weekday 0 = Monday
    (dow = (unix_day + 3) mod 7). Effects are NOT re-centered — they
    are per-weekday mean residuals around the fitted trend, which is
    already mean-zero overall (documented convention). Output one row:
    (n_days, slope, effect_0 … effect_6, seasonal_strength)."""
    from .hypotests import dec_double, dec_double_wide

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    mn = daily.agg(F.min("day").alias("d0"))
    based = daily.crossJoin(F.broadcast(mn)).select(
        "day",
        "y",
        (F.col("day") - F.col("d0")).cast("long").alias("x"),
        ((F.col("day") + F.lit(3)) % F.lit(7)).cast("int").alias("dow"),
    )
    mom = based.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("x")).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = dec_double(F.col("sx"))
    sy = dec_double(F.col("sy"))
    den = n * dec_double(F.col("sxx")) - sx * sx
    slope = (n * dec_double(F.col("sxy")) - sx * sy) / den
    icept = (sy - slope * sx) / n
    e = F.col("y").cast("double") - (icept + slope * F.col("x").cast("double"))
    d38 = "decimal(38,0)"
    resid = based.crossJoin(F.broadcast(mom)).select(
        "dow",
        F.floor(e * F.lit(1e6)).cast(d38).alias("e_fp"),
        slope.alias("b"),
    )
    per_dow = resid.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_w"),
        F.sum("e_fp").alias("se_fp"),
        F.max("b").alias("b"),
    )
    eff = dec_double_wide(F.col("se_fp")) / F.lit(1e6) / F.col(
        "n_w"
    ).cast("double")
    effects = per_dow.groupBy().agg(
        F.sum("n_w").alias("n_days"),
        F.round(F.max("b"), 6).alias("slope"),
        *[
            F.max(F.when(F.col("dow") == w, F.round(eff, 6))).alias(
                f"effect_{w}"
            )
            for w in range(7)
        ],
    )
    # strength: Var(resid - effect_dow) vs Var(resid), both around their
    # own means; effects join back per weekday (7-row broadcast)
    eff_tbl = per_dow.select(
        "dow", eff.alias("eff")
    )
    de = resid.join(F.broadcast(eff_tbl), "dow").select(
        (dec_double_wide(F.col("e_fp")) / F.lit(1e6)).alias("ev"),
        (dec_double_wide(F.col("e_fp")) / F.lit(1e6) - F.col("eff")).alias("dv"),
    )
    var_fold = de.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.floor(F.col("ev") * F.lit(1e6)).cast(d38)).alias("s_e"),
        F.sum(F.floor(F.col("ev") * F.col("ev") * F.lit(1e6)).cast(d38)).alias("q_e"),
        F.sum(F.floor(F.col("dv") * F.lit(1e6)).cast(d38)).alias("s_d"),
        F.sum(F.floor(F.col("dv") * F.col("dv") * F.lit(1e6)).cast(d38)).alias("q_d"),
    )
    nn = F.col("nn").cast("double")
    var_e = dec_double_wide(F.col("q_e")) / F.lit(1e6) / nn - (
        dec_double_wide(F.col("s_e")) / F.lit(1e6) / nn
    ) * (dec_double_wide(F.col("s_e")) / F.lit(1e6) / nn)
    var_d = dec_double_wide(F.col("q_d")) / F.lit(1e6) / nn - (
        dec_double_wide(F.col("s_d")) / F.lit(1e6) / nn
    ) * (dec_double_wide(F.col("s_d")) / F.lit(1e6) / nn)
    strength = var_fold.select(
        F.when(
            var_e > 0,
            F.round(
                F.greatest(
                    F.lit(0.0), F.lit(1.0) - var_d / var_e
                ),
                6,
            ),
        ).alias("seasonal_strength")
    )
    result = effects.crossJoin(F.broadcast(strength))
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def lagged_xcorr_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    lag: int = 1,
) -> DataFrame:
    """Lagged cross-correlation between the daily TOTAL VALUE and the
    daily EVENT COUNT ``lag`` days earlier — the Granger-style "does
    yesterday's traffic predict today's revenue" screen.

    Both series come out of ONE fact shuffle (count and sum in the
    same daily aggregate); the lag pairing is a self-join on
    day = day + lag over the bounded day grid (hash join, no window),
    and Pearson folds from exact decimal moments through the wide
    split. Output one row: (n_pairs, lag, xcorr)."""
    from .hypotests import dec_double_wide, dec_double_wide_frac

    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    daily = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(day.alias("day"), F.col(value_col).cast("decimal(18,2)").alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"), F.count(F.lit(1)).alias("c"))
        .persist()
    )
    daily.count()
    # guarded (28,2) -> (18,2) narrow before any product (see
    # _narrow_daily_total: the gini_concentration rule + loud failure
    # past the 10^16-cent envelope instead of an ANSI overflow)
    y18 = _narrow_daily_total(F.col("y"), "lagged_xcorr_daily")
    cur = daily.select("day", y18.alias("y"))
    prev = daily.select((F.col("day") + F.lit(lag)).alias("day"), F.col("c").alias("cp"))
    pairs = cur.join(prev, "day")
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("sy"),
        F.sum(F.col("cp").cast("decimal(38,0)")).alias("sc"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
        F.sum((F.col("cp").cast("decimal(19,0)") * F.col("cp").cast("decimal(19,0)")).cast("decimal(38,0)")).alias("scc"),
        F.sum((F.col("y") * F.col("cp").cast("decimal(19,0)")).cast("decimal(38,2)")).alias("syc"),
    )
    n = F.col("n").cast("double")
    sy = dec_double_wide_frac(F.col("sy"))
    sc = dec_double_wide(F.col("sc"))
    cov = n * dec_double_wide_frac(F.col("syc")) - sy * sc
    vy = n * dec_double_wide_frac(F.col("syy")) - sy * sy
    vc = n * dec_double_wide(F.col("scc")) - sc * sc
    result = mom.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.lit(lag).cast("long").alias("lag"),
        F.when(
            (vy > 0) & (vc > 0), F.round(cov / F.sqrt(vy * vc), 6)
        ).alias("xcorr"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def changepoint_binseg_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Single best change point of the daily-total series by binary
    segmentation: the split day minimizing SSE_left + SSE_right (the
    first step of the BinSeg/PELT family, exactly the CART split rule
    on time) — "when did this metric change regime".

    Prefix sums (S, Q cumulative decimal moments) over the bounded
    day grid give every candidate split's two SSEs in closed form; the
    argmin folds as one min over structs keyed by floor(sse·100) with
    the day as the deterministic tiebreak — no sort, no collect. The
    last day is excluded (a split needs a non-empty right side).
    Output one row: (n_days, split_day, sse_total, sse_split, gain)."""
    from .hypotests import dec_double_wide, dec_double_wide_frac

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    # guarded (18,2) narrow before the square (the gini_concentration
    # rule; loud failure past the 10^16-cent envelope)
    y18 = _narrow_daily_total(F.col("y"), "changepoint_binseg_daily")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("nl"),
        F.sum(y18.cast("decimal(38,2)")).over(w).alias("sl"),
        F.sum((y18 * y18).cast("decimal(38,4)")).over(w).alias("ql"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y18.cast("decimal(38,2)")).alias("s"),
        F.sum((y18 * y18).cast("decimal(38,4)")).alias("q"),
    )
    both = pre.crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("n"))
    nl = F.col("nl").cast("double")
    nr = (F.col("n") - F.col("nl")).cast("double")
    sl = dec_double_wide_frac(F.col("sl"))
    ql = dec_double_wide_frac(F.col("ql"))
    s = dec_double_wide_frac(F.col("s"))
    q = dec_double_wide_frac(F.col("q"))
    sse_l = ql - sl * sl / nl
    sse_r = (q - ql) - (s - sl) * (s - sl) / nr
    sse = sse_l + sse_r
    sse_fp = F.floor(sse * F.lit(100.0)).cast("decimal(38,0)")
    best = both.agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("q").alias("q"),
        F.min(
            F.struct(
                sse_fp.alias("sse_fp"), F.col("day").alias("day")
            )
        ).alias("top"),
    )
    n = F.col("n").cast("double")
    s2 = dec_double_wide_frac(F.col("s"))
    q2 = dec_double_wide_frac(F.col("q"))
    sst = q2 - s2 * s2 / n
    sse_best = dec_double_wide(F.col("top.sse_fp")) / F.lit(100.0)
    result = best.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("top.day").cast("long").alias("split_day"),
        (F.floor(sst * F.lit(100.0)) / F.lit(100.0)).alias("sse_total"),
        sse_best.alias("sse_split"),
        (
            F.floor((sst - sse_best) * F.lit(100.0)) / F.lit(100.0)
        ).alias("gain"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def theil_u_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Theil's U1 forecastability of the daily-total series: RMSE of
    the naive y_t = y_{t−1} forecast over (RMS(y_t) + RMS(y_{t−1})).
    U → 0 means yesterday predicts today; U near 1 means the naive
    forecast is as bad as predicting zero — the cheap "is this series
    even forecastable" gate before fitting anything.

    The lag pairing is a self-join on the bounded day grid; the three
    quadratic sums fold as exact decimals through the wide split.
    Output one row: (n_pairs, theil_u)."""
    from .hypotests import dec_double_wide_frac

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    # guarded (18,2) narrow before products (the gini_concentration
    # rule; loud failure past the 10^16-cent envelope)
    y18 = _narrow_daily_total(F.col("y"), "theil_u_daily")
    cur = daily.select("day", y18.alias("y"))
    prev = daily.select(
        (F.col("day") + F.lit(1)).alias("day"), y18.alias("yp")
    )
    pairs = cur.join(prev, "day")
    d = (F.col("y") - F.col("yp")).cast("decimal(18,2)")
    mom = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((d * d).cast("decimal(38,4)")).alias("sdd"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
        F.sum((F.col("yp") * F.col("yp")).cast("decimal(38,4)")).alias(
            "spp"
        ),
    )
    n = F.col("n").cast("double")
    rmse = F.sqrt(dec_double_wide_frac(F.col("sdd")) / n)
    rms_y = F.sqrt(dec_double_wide_frac(F.col("syy")) / n)
    rms_p = F.sqrt(dec_double_wide_frac(F.col("spp")) / n)
    result = mom.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.when(
            rms_y + rms_p > 0, F.round(rmse / (rms_y + rms_p), 6)
        ).alias("theil_u"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def cox_stuart_trend_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Cox–Stuart sign test for monotone trend in the daily-total
    series: pair day i with day i + ⌈n/2⌉ (middle day dropped when n
    is odd), count sign of the later-minus-earlier difference, and
    test the positive share against Binomial(S, ½) — the assumption-
    free "is this drifting at all" screen that complements
    mann_kendall (which weighs EVERY pair; Cox–Stuart reads only the
    half-distance pairs, so it is immune to seasonal echo at lags
    < n/2).

    The day index is a rank over the BOUNDED day grid (the one
    allowed unpartitioned window); the half-offset pairing is one
    bounded self-join. Ties (equal totals) drop, the standard
    convention. z uses the exact binomial moments, no continuity
    correction (documented). Output one row:
    (n_days, n_pairs, n_pos, n_neg, z_score)."""
    daily = _daily_series(df, ts_col, value_col)
    win = Window.orderBy("day")
    idx = daily.select(
        "day", "y", (F.row_number().over(win) - F.lit(1)).alias("i")
    )
    tot = idx.agg(F.count(F.lit(1)).alias("n"))
    half = F.expr("(n + 1) div 2")
    a = idx.crossJoin(F.broadcast(tot.select(half.alias("h"), "n")))
    b = idx.select(F.col("i").alias("i2"), F.col("y").alias("y2"))
    pairs = a.join(b, F.col("i") + F.col("h") == F.col("i2"))
    folded = pairs.agg(
        F.max("n").alias("n_days"),
        F.sum(F.when(F.col("y2") > F.col("y"), 1).otherwise(0)).alias(
            "n_pos"
        ),
        F.sum(F.when(F.col("y2") < F.col("y"), 1).otherwise(0)).alias(
            "n_neg"
        ),
    )
    s = (F.col("n_pos") + F.col("n_neg")).cast("double")
    z = (
        F.col("n_pos").cast("double") - s / F.lit(2.0)
    ) / F.sqrt(s / F.lit(4.0))
    return folded.select(
        F.col("n_days").cast("long").alias("n_days"),
        (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n_pairs"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.when(s > 0, F.round(z, 6)).alias("z_score"),
    )


def seasonal_periodogram_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    periods: tuple = (7, 30),
) -> DataFrame:
    """Goertzel-style periodogram power of the daily-total series at
    the given candidate periods — "how much of the variance is a
    weekly (monthly) cycle", the cheap spectral screen before fitting
    seasonal models: for period p,
    frac_p = 2·(a² + b²)/den with a = Σ(y_t − ȳ)·cos(2πt/p),
    b likewise with sin, den = Σ(y_t − ȳ)².

    cos/sin are evaluated on the exact integer phase (day mod p)/p and
    ROUNDED TO 6 DP before the multiply (the portable-log rule: both
    engines' libm agree far below 1e-6, and the rounded factor makes
    the decimal products exact and order-independent). The mean term
    expands algebraically (a = Σy·c − ȳ·Σc — the acf_daily recipe), so
    nothing re-scans facts. Output per period:
    (period, n_days, power_fraction)."""
    from .hypotests import dec_double

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("q"),
    )
    pp = (
        daily.select(
            "day",
            "y",
            F.explode(
                F.array(*[F.lit(int(p)) for p in periods])
            ).alias("p"),
        )
        .select(
            "p",
            "y",
            F.round(
                F.cos(
                    F.lit(2.0 * 3.141592653589793)
                    * (F.col("day") % F.col("p")).cast("double")
                    / F.col("p").cast("double")
                ),
                6,
            ).cast("decimal(8,6)").alias("cw"),
            F.round(
                F.sin(
                    F.lit(2.0 * 3.141592653589793)
                    * (F.col("day") % F.col("p")).cast("double")
                    / F.col("p").cast("double")
                ),
                6,
            ).cast("decimal(8,6)").alias("sw"),
        )
        .groupBy("p")
        .agg(
            F.sum((F.col("y") * F.col("cw")).cast("decimal(38,8)")).alias(
                "yc"
            ),
            F.sum((F.col("y") * F.col("sw")).cast("decimal(38,8)")).alias(
                "ys"
            ),
            F.sum(F.col("cw").cast("decimal(38,6)")).alias("sc"),
            F.sum(F.col("sw").cast("decimal(38,6)")).alias("ss"),
        )
    )
    from .hypotests import dec_double_wide_frac

    n = F.col("n").cast("double")
    m = dec_double_wide_frac(F.col("s")) / n
    a = dec_double_wide_frac(F.col("yc")) - m * dec_double_wide_frac(
        F.col("sc")
    )
    b = dec_double_wide_frac(F.col("ys")) - m * dec_double_wide_frac(
        F.col("ss")
    )
    den = dec_double_wide_frac(F.col("q")) - dec_double_wide_frac(
        F.col("s")
    ) * m
    result = pp.crossJoin(F.broadcast(tot)).select(
        F.col("p").cast("long").alias("period"),
        F.col("n").cast("long").alias("n_days"),
        F.when(
            den > 0, F.round(F.lit(2.0) * (a * a + b * b) / (n * den), 6)
        ).alias("power_fraction"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def interarrival_burstiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Corpus-level burstiness of per-user inter-event times: for each
    user with ≥ 3 events, the gap coefficient-of-variation feeds
    B = (σ − μ)/(σ + μ) ∈ [−1, 1] (B → −1 periodic, 0 Poisson, → +1
    bursty; Goh & Barabási's measure) — then one summary row over
    users: how bursty is this event stream really?

    Per-user lag gaps ride ONE hash-partitioned window (the
    user_activity_streaks shape); per-user moments fold in exact
    integer micros, and the per-user B values aggregate with the
    round-6 decimal recipe. Output one row:
    (n_users, n_gaps, mean_burstiness, share_bursty)."""
    w = Window.partitionBy("__u").orderBy("__ts")
    ev = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp))").alias("__ts"),
    )
    gaps = ev.select(
        "__u", (F.col("__ts") - F.lag("__ts").over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    per_u = gaps.groupBy("__u").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("g").cast("decimal(38,0)")).alias("sg"),
        F.sum(
            (F.col("g").cast("decimal(19,0)") * F.col("g")).cast(
                "decimal(38,0)"
            )
        ).alias("qg"),
    )
    from .hypotests import dec_double_wide

    ng = F.col("ng").cast("double")
    mu = dec_double_wide(F.col("sg")) / ng
    var = dec_double_wide(F.col("qg")) / ng - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    bb = F.when(sd + mu > 0, (sd - mu) / (sd + mu))
    scored = per_u.filter(F.col("ng") >= 2).select(
        "ng", F.round(bb, 6).alias("b")
    )
    folded = scored.filter(F.col("b").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("ng").alias("n_gaps"),
        F.sum(F.col("b").cast("decimal(18,6)")).alias("sb"),
        F.sum(F.when(F.col("b") > 0, 1).otherwise(0)).alias("nb"),
    )
    return folded.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.when(
            F.col("n_users") > 0,
            F.round(
                F.col("sb").cast("double") / F.col("n_users").cast("double"),
                6,
            ),
        ).alias("mean_burstiness"),
        F.when(
            F.col("n_users") > 0,
            F.round(
                F.col("nb").cast("double") / F.col("n_users").cast("double"),
                6,
            ),
        ).alias("share_bursty"),
    )


def hurst_rs_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    block_sizes: tuple = (8, 16, 32),
) -> DataFrame:
    """Hurst exponent of the daily-total series by rescaled-range
    (R/S) analysis: split the day grid into blocks of each size, per
    block compute R = range of the cumulative mean-deviation walk and
    S = population sd, average R/S per size, and fit
    ln(R/S) ~ H·ln(size) — H ≈ 0.5 is a random walk, > 0.5 trending /
    long-memory, < 0.5 mean-reverting. The classic "does this metric
    have memory" diagnostic.

    The fact table collapses to the bounded day grid once; block
    indices come from the day-rank (the one allowed unpartitioned
    window, bounded); the cumulative walk is a window PARTITIONED by
    (size, block) — ≤ 32 rows per partition. Incomplete tail blocks
    and zero-variance blocks are excluded (documented convention).
    Per-size means and the 3-point log-log OLS close with the round-6
    decimal recipe. Output one row:
    (n_days, n_blocks_used, hurst_h, r2)."""
    from .hypotests import dec_double

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    y18 = _narrow_daily_total(F.col("y"), "hurst_rs_daily")
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - F.lit(1)).alias("i"),
        y18.alias("y"),
    )
    sizes = F.array(*[F.lit(int(s)) for s in block_sizes])
    rows = idx.select(
        "i", "y", F.explode(sizes).alias("s")
    ).select(
        "s", "i", "y", F.expr("i div s").alias("blk")
    )
    wb = Window.partitionBy("s", "blk")
    wcum = (
        Window.partitionBy("s", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = rows.select(
        "s",
        "blk",
        "i",
        "y",
        F.count(F.lit(1)).over(wb).alias("cnt"),
        F.sum(F.col("y").cast("decimal(38,2)")).over(wb).alias("tot"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)"))
        .over(wb)
        .alias("q"),
        F.sum(F.col("y").cast("decimal(38,2)")).over(wcum).alias("cumy"),
        F.row_number().over(
            Window.partitionBy("s", "blk").orderBy("i")
        ).alias("r"),
    ).filter(F.col("cnt") == F.col("s"))
    mu = dec_double(F.col("tot")) / F.col("cnt").cast("double")
    cumdev = dec_double(F.col("cumy")) - F.col("r").cast("double") * mu
    per_blk = (
        t.select(
            "s", "blk", "cnt", "tot", "q", cumdev.alias("cd")
        )
        .groupBy("s", "blk")
        .agg(
            F.max("cnt").alias("cnt"),
            F.max("tot").alias("tot"),
            F.max("q").alias("q"),
            F.max("cd").alias("cd_max"),
            F.min("cd").alias("cd_min"),
        )
    )
    cntd = F.col("cnt").cast("double")
    mu2 = dec_double(F.col("tot")) / cntd
    s2 = dec_double(F.col("q")) / cntd - mu2 * mu2
    rs = F.when(
        s2 > 0,
        F.round(
            (F.col("cd_max") - F.col("cd_min")) / F.sqrt(s2), 6
        ),
    )
    per_size = (
        per_blk.select("s", rs.alias("rs"))
        .filter(F.col("rs").isNotNull())
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.col("rs").cast("decimal(28,6)")).alias("rs_sum"),
        )
        .filter(F.col("rs_sum") > 0)
    )
    lx = F.round(F.log(F.col("s").cast("double")), 6)
    ly = F.round(
        F.log(
            F.col("rs_sum").cast("double") / F.col("nb").cast("double")
        ),
        6,
    )
    mom = per_size.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("nb").alias("n_blocks_used"),
        F.sum(lx.cast("decimal(18,6)")).alias("sx"),
        F.sum(ly.cast("decimal(18,6)")).alias("sy"),
        F.sum(F.round(lx * lx, 12).cast("decimal(28,12)")).alias("sxx"),
        F.sum(F.round(lx * ly, 12).cast("decimal(28,12)")).alias("sxy"),
        F.sum(F.round(ly * ly, 12).cast("decimal(28,12)")).alias("syy"),
    )
    n_days = daily.select(F.count(F.lit(1)).alias("n_days"))
    npd = F.col("np").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx_c = F.col("sxx").cast("double") - sx * sx / npd
    sxy_c = F.col("sxy").cast("double") - sx * sy / npd
    syy_c = F.col("syy").cast("double") - sy * sy / npd
    ok = (F.col("np") > 1) & (sxx_c > 0) & (syy_c > 0)
    result = mom.crossJoin(F.broadcast(n_days)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_blocks_used").cast("long").alias("n_blocks_used"),
        F.when(ok, F.round(sxy_c / sxx_c, 6)).alias("hurst_h"),
        F.when(ok, F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6)).alias("r2"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def type_mix_entropy_trend(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Daily event-type mix entropy and its linear trend — "is the
    traffic composition collapsing or diversifying over time": per day
    the Shannon entropy of the type distribution, then an OLS slope of
    entropy against the day index over the bounded day grid (a
    negative slope = one type is taking over; the composition-drift
    alarm for event pipelines).

    One (day, type) count shuffle; per-day entropies fold with the
    round-6 decimal log recipe over the bounded day×type relation;
    the trend closes from exact decimal moments over #days points.
    Output one row:
    (n_days, mean_entropy, slope_per_day, r2)."""
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    cells = (
        df.filter(F.col(type_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(day.alias("day"), F.col(type_col).alias("t"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wd = Window.partitionBy("day")
    t = cells.select(
        "day", "c", F.sum("c").over(wd).alias("nd")
    )
    p = F.col("c").cast("double") / F.col("nd").cast("double")
    per_day = t.groupBy("day").agg(
        F.sum(F.round(-p * F.log(p), 6).cast("decimal(18,6)")).alias("h")
    )
    # day index from the rank over the bounded grid — slope per GRID
    # step, immune to calendar gaps
    idx = per_day.select(
        (F.row_number().over(Window.orderBy("day")) - F.lit(1)).alias("i"),
        F.col("h"),
    )
    lx = F.col("i").cast("double")
    ly = F.col("h").cast("double")
    mom = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("h").cast("decimal(38,6)")).alias("sy"),
        F.sum(
            (F.col("i").cast("decimal(19,0)") * F.col("i")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
        F.sum(F.round(lx * ly, 12).cast("decimal(38,12)")).alias("sxy"),
        F.sum(F.round(ly * ly, 12).cast("decimal(38,12)")).alias("syy"),
    )
    from .hypotests import dec_double_wide, dec_double_wide_frac

    n = F.col("n").cast("double")
    sx = dec_double_wide(F.col("sx"))
    sy = dec_double_wide_frac(F.col("sy"))
    sxx_c = dec_double_wide(F.col("sxx")) - sx * sx / n
    sxy_c = dec_double_wide_frac(F.col("sxy")) - sx * sy / n
    syy_c = dec_double_wide_frac(F.col("syy")) - sy * sy / n
    ok = (F.col("n") > 1) & (sxx_c > 0)
    return mom.select(
        F.col("n").cast("long").alias("n_days"),
        F.when(F.col("n") > 0, F.round(sy / n, 6)).alias("mean_entropy"),
        F.when(ok, F.round(sxy_c / sxx_c, 6)).alias("slope_per_day"),
        F.when(
            ok & (syy_c > 0),
            F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6),
        ).alias("r2"),
    )


def evt_block_maxima(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    block_days: int = 7,
) -> DataFrame:
    """Extreme-value analysis by block maxima: weekly maxima of the
    daily totals, fit a Gumbel distribution by the method of moments
    (β̂ = s·√6/π, μ̂ = m̄ − γ·β̂ with Euler's γ) and report the
    10-block return level μ̂ − β̂·ln(−ln(1 − 1/10)) — "how big a day
    should we provision for" from the tail, not the mean.

    Daily totals collapse to the bounded day grid, block maxima to the
    ~#days/block grid; moments are exact decimals, the Gumbel closing
    sequence fixed doubles. Output one row:
    (n_blocks, max_mean, max_sd, gumbel_mu, gumbel_beta,
    return_level_10)."""
    from .hypotests import dec_double_wide_frac

    daily = _daily_series(df, ts_col, value_col)
    blocks = (
        daily.select(
            F.expr(f"day div {block_days}").alias("blk"),
            _narrow_daily_total(F.col("y"), "evt_block_maxima").alias("y"),
        )
        .groupBy("blk")
        .agg(F.max("y").alias("m"))
    )
    mom = blocks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("m").cast("decimal(38,2)")).alias("s"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(38,4)")).alias("q"),
    )
    n = F.col("n").cast("double")
    mean = dec_double_wide_frac(F.col("s")) / n
    var = (
        dec_double_wide_frac(F.col("q")) - dec_double_wide_frac(F.col("s")) * mean
    ) / (n - F.lit(1.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    beta = sd * F.lit(0.7796968012336293)  # sqrt(6)/pi
    gamma = F.lit(0.5772156649015329)
    mu = mean - gamma * beta
    # 10-block return level: the Gumbel quantile at 1 - 1/10 is
    # mu - beta*ln(-ln(0.9)) and ln(-ln(0.9)) = -2.250367327069, so
    # RL = mu + 2.250367327069*beta (fixed literal on both engines)
    ok = F.col("n") > 2
    return mom.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.when(F.col("n") > 0, F.round(mean, 6)).alias("max_mean"),
        F.when(ok, F.round(sd, 6)).alias("max_sd"),
        F.when(ok, F.round(mu, 6)).alias("gumbel_mu"),
        F.when(ok, F.round(beta, 6)).alias("gumbel_beta"),
        F.when(
            ok, F.round(mu + beta * F.lit(2.250367327069), 6)
        ).alias("return_level_10"),
    )


def mase_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    season: int = 7,
) -> DataFrame:
    """Mean absolute scaled error structure of the daily-total series:
    MAE of the naive lag-1 forecast over MAE of the seasonal lag-7
    naive — MASE < 1 means yesterday's value beats last week's
    (momentum-dominated series), > 1 means the weekly rhythm carries
    more signal than the trend (the model-selection fork for any
    demand forecast).

    Two bounded day-grid self-joins (calendar lags — gap days produce
    no pair); exact decimal |Δ| sums, one closing ratio. Output one
    row: (n_days, n_pairs_1, n_pairs_s, mae_naive, mae_seasonal,
    mase)."""
    from .hypotests import dec_double_wide_frac

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()

    def lag_mae(lag: int, tag: str):
        cur = daily.select("day", "y")
        prev = daily.select(
            (F.col("day") + F.lit(lag)).alias("day"),
            F.col("y").alias("yp"),
        )
        return (
            cur.join(prev, "day")
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum(
                    F.abs(F.col("y") - F.col("yp")).cast("decimal(38,2)")
                ).alias(f"s_{tag}"),
            )
        )
    m1 = lag_mae(1, "one")
    ms = lag_mae(season, "sea")
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    n1 = F.col("n_one").cast("double")
    ns = F.col("n_sea").cast("double")
    mae1 = dec_double_wide_frac(F.col("s_one")) / n1
    maes = dec_double_wide_frac(F.col("s_sea")) / ns
    result = (
        m1.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_one").cast("long").alias("n_pairs_1"),
            F.col("n_sea").cast("long").alias("n_pairs_s"),
            F.when(F.col("n_one") > 0, F.round(mae1, 6)).alias("mae_naive"),
            F.when(F.col("n_sea") > 0, F.round(maes, 6)).alias(
                "mae_seasonal"
            ),
            F.when(
                (F.col("n_one") > 0) & (F.col("n_sea") > 0) & (maes > 0),
                F.round(mae1 / maes, 6),
            ).alias("mase"),
        )
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def turning_points_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Turning-points randomness test on the daily-total series: count
    strict local extrema (yₜ₋₁ < yₜ > yₜ₊₁ or the mirror) and compare
    against the i.i.d. null E = 2(n−2)/3, Var = (16n−29)/90 — too FEW
    turning points means momentum/trend, too MANY means alternating
    (negative-autocorrelation) noise. The assumption-free complement
    to runs_test (which dichotomizes around the median and loses the
    local-shape signal).

    The fact table collapses to the bounded day relation first
    (``_daily_series``); the lag/lead walk is a window over that
    ≤ #days-row relation only. Interior ties (yₜ₋₁ = yₜ or yₜ = yₜ₊₁)
    are not extrema under the STRICT inequality convention
    (documented; exact daily decimal totals rarely tie). Output one
    row: (n_days, n_turning, expected, z_score)."""
    daily = _daily_series(df, ts_col, value_col)
    win = Window.orderBy("day")
    walked = daily.select(
        "y",
        F.lag("y").over(win).alias("yp"),
        F.lead("y").over(win).alias("yn"),
    )
    turning = (
        ((F.col("yp") < F.col("y")) & (F.col("y") > F.col("yn")))
        | ((F.col("yp") > F.col("y")) & (F.col("y") < F.col("yn")))
    )
    folded = walked.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(turning, 1).otherwise(0)).alias("n_turning"),
    )
    n = F.col("n_days").cast("double")
    t = F.col("n_turning").cast("double")
    mean = F.lit(2.0) * (n - F.lit(2.0)) / F.lit(3.0)
    var = (F.lit(16.0) * n - F.lit(29.0)) / F.lit(90.0)
    return folded.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("n_turning").cast("long").alias("n_turning"),
        F.when(F.col("n_days") > 2, F.round(mean, 6)).alias("expected"),
        F.when(
            (F.col("n_days") > 2) & (var > 0),
            F.round((t - mean) / F.sqrt(var), 6),
        ).alias("z_score"),
    )


def sample_entropy_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    m: int = 2,
    r_frac: float = 0.2,
) -> DataFrame:
    """Sample entropy SampEn(m, r = r_frac·σ) of the daily-total
    series — the regularity number anomaly pipelines read: low SampEn
    means the series repeats its own m-step patterns (predictable),
    high means every window is novel. SampEn = −ln(A/B) with B the
    count of template pairs of length m within Chebyshev distance r,
    A the same for length m+1 (Richman & Moorman 2000; both counts
    over the same N−m template starts, self-matches excluded).

    The fact table collapses to the bounded day relation; the
    template walk is a lead-window over that relation and the pair
    counts one bounded self-join (≤ #days² comparisons, constant in
    corpus size). σ is the population SD from exact decimal moments;
    the r threshold and all comparisons are fixed double sequences.
    Output one row: (n_days, r_threshold, b_count, a_count, sampen)."""
    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    win = Window.orderBy("day")
    walked = daily.select(
        (F.row_number().over(win) - F.lit(1)).alias("i"),
        *[
            (F.lead("y", k).over(win).cast("double") if k else
             F.col("y").cast("double")).alias(f"y{k}")
            for k in range(m + 1)
        ],
    ).filter(F.col(f"y{m}").isNotNull())
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("q"),
    )
    from .hypotests import dec_double_wide_frac

    n = F.col("n").cast("double")
    var = (
        dec_double_wide_frac(F.col("q"))
        - dec_double_wide_frac(F.col("s"))
        * dec_double_wide_frac(F.col("s"))
        / n
    ) / n
    rr = F.lit(float(r_frac)) * F.sqrt(F.greatest(var, F.lit(0.0)))
    a_side = walked.select(
        F.col("i").alias("ia"), *[F.col(f"y{k}").alias(f"a{k}") for k in range(m + 1)]
    )
    b_side = walked.select(
        F.col("i").alias("ib"), *[F.col(f"y{k}").alias(f"b{k}") for k in range(m + 1)]
    )
    pairs = (
        a_side.join(b_side, F.col("ia") < F.col("ib"))
        .crossJoin(F.broadcast(mom.select(rr.alias("r"), "n")))
    )
    cheb_m = None
    for k in range(m):
        dk = F.abs(F.col(f"a{k}") - F.col(f"b{k}"))
        cheb_m = dk if cheb_m is None else F.greatest(cheb_m, dk)
    cheb_m1 = F.greatest(cheb_m, F.abs(F.col(f"a{m}") - F.col(f"b{m}")))
    folded = pairs.agg(
        F.max("n").alias("n_days"),
        F.max("r").alias("r"),
        F.sum(F.when(cheb_m < F.col("r"), 1).otherwise(0)).alias("b_cnt"),
        F.sum(F.when(cheb_m1 < F.col("r"), 1).otherwise(0)).alias("a_cnt"),
    )
    result = folded.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.col("r"), 6).alias("r_threshold"),
        F.col("b_cnt").cast("long").alias("b_count"),
        F.col("a_cnt").cast("long").alias("a_count"),
        F.when(
            (F.col("a_cnt") > 0) & (F.col("b_cnt") > 0),
            F.round(
                F.log(F.col("b_cnt").cast("double"))
                - F.log(F.col("a_cnt").cast("double")),
                6,
            ),
        ).alias("sampen"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def spectral_entropy_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Normalized spectral entropy of the daily-total series: the
    Shannon entropy of the mean-centered periodogram over the Fourier
    frequencies k = 1..⌊(n−1)/2⌋, divided by ln(K) — 1 means white
    (power spread evenly), → 0 means one dominant cycle. The
    one-number "is there structure in this series at ALL" screen
    complementing seasonal_periodogram_daily's fixed candidate
    periods; also reports the dominant frequency and its power share.

    cos/sin evaluate on the exact integer phase (k·t mod n)/n and
    round to 6 dp before the decimal product (the periodogram parity
    recipe); the mean term expands algebraically. Everything after
    the daily collapse runs on ≤ #days·K bounded rows. Output one
    row: (n_days, n_freqs, peak_k, peak_share, spectral_entropy)."""
    from .hypotests import dec_double_wide_frac

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    win = Window.orderBy("day")
    idx = daily.select(
        "y", (F.row_number().over(win) - F.lit(1)).alias("t")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
    )
    kt = (
        idx.crossJoin(F.broadcast(tot))
        .select(
            "y",
            "t",
            "n",
            "s",
            # Spark's sequence(1, 0) steps BACKWARDS ([1, 0]) instead
            # of returning empty — with n <= 2 days that would
            # fabricate a k=0 "frequency" (and diverge from SQL
            # range(), which is empty). Guard to an empty array.
            F.explode(
                F.when(
                    F.expr("(n - 1) div 2") >= 1,
                    F.sequence(F.lit(1), F.expr("(n - 1) div 2")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("k"),
        )
        .select(
            "y",
            "k",
            "n",
            "s",
            F.round(
                F.cos(
                    F.lit(2.0 * 3.141592653589793)
                    * ((F.col("k") * F.col("t")) % F.col("n")).cast("double")
                    / F.col("n").cast("double")
                ),
                6,
            ).cast("decimal(8,6)").alias("cw"),
            F.round(
                F.sin(
                    F.lit(2.0 * 3.141592653589793)
                    * ((F.col("k") * F.col("t")) % F.col("n")).cast("double")
                    / F.col("n").cast("double")
                ),
                6,
            ).cast("decimal(8,6)").alias("sw"),
        )
    )
    per_k = kt.groupBy("k").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum((F.col("y") * F.col("cw")).cast("decimal(38,8)")).alias("yc"),
        F.sum((F.col("y") * F.col("sw")).cast("decimal(38,8)")).alias("ys"),
        F.sum(F.col("cw").cast("decimal(38,6)")).alias("sc"),
        F.sum(F.col("sw").cast("decimal(38,6)")).alias("ss"),
    )
    n = F.col("n").cast("double")
    mu = dec_double_wide_frac(F.col("s")) / n
    ac = dec_double_wide_frac(F.col("yc")) - mu * dec_double_wide_frac(
        F.col("sc")
    )
    bs = dec_double_wide_frac(F.col("ys")) - mu * dec_double_wide_frac(
        F.col("ss")
    )
    powered = per_k.select(
        "k", "n", (ac * ac + bs * bs).alias("p")
    )
    ptot = powered.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("kk"),
        F.sum(F.round(F.col("p"), 6).cast("decimal(38,6)")).alias("pt"),
        F.max(F.struct(F.col("p"), (-F.col("k")).alias("nk"))).alias("pk"),
    )
    # entropy fold over the bounded K-row power relation
    share = F.round(F.col("p"), 6).cast("decimal(38,6)").cast(
        "double"
    ) / dec_double_wide_frac(F.col("pt"))
    ent_term = F.when(
        share > 0, F.round(-share * F.log(share), 6)
    ).otherwise(F.lit(0.0)).cast("decimal(18,6)")
    hfold = (
        powered.crossJoin(
            F.broadcast(ptot.select("pt", F.col("kk").alias("kk2")))
        )
        .agg(F.sum(ent_term).alias("h"))
    )
    # n_days comes from the day relation itself, not through the
    # frequency fold: with < 3 days there are no Fourier frequencies
    # and max(n) over the empty power relation would NULL the count
    result = (
        ptot.crossJoin(F.broadcast(hfold))
        .crossJoin(F.broadcast(tot.select(F.col("n").alias("__nd"))))
        .select(
            F.col("__nd").cast("long").alias("n_days"),
            F.col("kk").cast("long").alias("n_freqs"),
            (-F.col("pk.nk")).cast("long").alias("peak_k"),
            F.when(
                dec_double_wide_frac(F.col("pt")) > 0,
                F.round(
                    F.round(F.col("pk.p"), 6)
                    / dec_double_wide_frac(F.col("pt")),
                    6,
                ),
            ).alias("peak_share"),
            F.when(
                F.col("kk") > 1,
                F.round(
                    F.col("h").cast("double")
                    / F.log(F.col("kk").cast("double")),
                    6,
                ),
            ).alias("spectral_entropy"),
        )
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def dispersion_daily_counts(
    df: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Index of dispersion (Fano factor) of the daily EVENT COUNTS:
    var/mean = 1 for a Poisson arrival process; ≫ 1 flags bursty
    clustering, ≪ 1 unnatural regularity (a bot emitting on a timer,
    or a sampled/deduplicated feed) — with the conditional-χ²
    companion Σ(xₜ−x̄)²/x̄ (the dispersion test statistic, n−1 df).

    One count-per-day shuffle to the bounded day grid; exact integer
    count moments, fixed-double closing sequence. Output one row:
    (n_days, mean_count, fano, dispersion_chi2)."""
    d19 = "decimal(19,0)"
    d38 = "decimal(38,0)"
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .select(day.alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    folded = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum((F.col("x").cast(d19) * F.col("x")).cast(d38)).alias("q"),
    )
    from .hypotests import dec_double_wide

    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = (dec_double_wide(F.col("q")) - F.col("s").cast("double") * mean) / (
        n - F.lit(1.0)
    )
    ok = (F.col("n") > 1) & (mean > 0)
    return folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.when(F.col("n") > 0, F.round(mean, 6)).alias("mean_count"),
        F.when(ok, F.round(var / mean, 6)).alias("fano"),
        F.when(ok, F.round((n - F.lit(1.0)) * var / mean, 6)).alias(
            "dispersion_chi2"
        ),
    )


def max_drawdown_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Maximum drawdown of the daily-total series — the deepest drop
    from a running peak, in absolute units and as a fraction of that
    peak: the single number an ops dashboard reads to answer "how bad
    did the worst slump get before recovery". dd_t = peak_t − y_t with
    peak_t = max(y_1..y_t); the report is max_t dd_t and
    max_t dd_t/peak_t (the two maxima are taken independently — they
    can land on different days when peaks differ, which is the
    convention that keeps the output scalar and deterministic).

    The fact table collapses to the bounded day relation first
    (``_daily_series``); the running peak is a window over that
    ≤ #days-row relation only (the calendar-bounded-window
    discipline). Daily totals are exact decimal(18,2), so drawdowns
    are exact decimals; the pct path guards peak_t > 0. Output one
    row: (n_days, peak_value, max_drawdown, max_drawdown_pct)."""
    daily = _daily_series(df, ts_col, value_col)
    win = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walked = daily.select(
        "y", F.max("y").over(win).alias("peak")
    )
    dd = F.col("peak") - F.col("y")
    folded = walked.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("peak").alias("peak_value"),
        F.max(dd).alias("max_dd"),
        F.max(
            F.when(
                F.col("peak") > 0,
                dd.cast("double") / F.col("peak").cast("double"),
            )
        ).alias("max_dd_pct"),
    )
    return folded.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("peak_value").cast("double").alias("peak_value"),
        F.col("max_dd").cast("double").alias("max_drawdown"),
        F.round(F.col("max_dd_pct"), 6).alias("max_drawdown_pct"),
    )


def kpss_level_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    lags: int = 7,
) -> DataFrame:
    """KPSS level-stationarity statistic of the daily-total series —
    the null-reversed complement to the trend/momentum dials
    (mann_kendall, hurst): KPSS's NULL is "stationary around a level",
    so a LARGE η rejects stationarity (unit root / wandering level).
    η = (1/N²)·Σ_t S_t² / s²(l) with S_t the partial sums of the
    demeaned series and s²(l) the Bartlett-weighted long-run variance
    (Kwiatkowski-Phillips-Schmidt-Shin 1992, eq. 10-11).

    The fact table collapses to the bounded day relation first; the
    cumulative S_t and the j-lag products are windows over that
    ≤ #days-row relation only. S_t comes from an ORDERED window, so
    its double accumulation order is identical on both engines; the
    unordered closing sums fold as floor(·10⁴) fixed point. The
    Bartlett bandwidth is a caller parameter (statsmodels' nlags
    contract) — the default l = 7 makes every weight 1 − j/8 an EXACT
    binary double, so no weight literal can diverge between engines.
    Output one row: (n_days, lags, s2_longrun, kpss_stat)."""
    from .hypotests import dec_double, dec_double_wide

    daily = _daily_series(df, ts_col, value_col)
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    win = Window.orderBy("day")
    wcum = win.rowsBetween(Window.unboundedPreceding, 0)
    base = daily.crossJoin(F.broadcast(tot))
    mean = dec_double(F.col("sy")) / F.col("n").cast("double")
    walked = base.select(
        "n",
        "day",
        (F.col("y").cast("double") - mean).alias("e"),
    ).select(
        "n",
        "e",
        F.sum("e").over(wcum).alias("s_t"),
        *[
            F.lag("e", j).over(win).alias(f"e_lag{j}")
            for j in range(1, lags + 1)
        ],
    )
    folded = walked.agg(
        F.max("n").alias("n"),
        F.sum(
            F.floor(F.col("s_t") * F.col("s_t") * F.lit(1e4)).cast(
                "decimal(38,0)"
            )
        ).alias("num_fp"),
        F.sum(
            F.floor(F.col("e") * F.col("e") * F.lit(1e4)).cast(
                "decimal(38,0)"
            )
        ).alias("g0_fp"),
        *[
            F.sum(
                F.floor(
                    F.col("e") * F.col(f"e_lag{j}") * F.lit(1e4)
                ).cast("decimal(38,0)")
            ).alias(f"g{j}_fp")
            for j in range(1, lags + 1)
        ],
    )
    nd = F.col("n").cast("double")
    s2 = dec_double_wide(F.col("g0_fp")) / F.lit(1e4)
    for j in range(1, lags + 1):
        w_j = 1.0 - j / (lags + 1.0)
        s2 = s2 + F.lit(2.0) * F.lit(w_j) * (
            F.coalesce(
                dec_double_wide(F.col(f"g{j}_fp")), F.lit(0.0)
            )
            / F.lit(1e4)
        )
    s2 = s2 / nd
    num = dec_double_wide(F.col("num_fp")) / F.lit(1e4)
    eta = num / (nd * nd) / s2
    return folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(lags).cast("long").alias("lags"),
        F.when(F.col("n") > 0, F.round(s2, 6)).alias("s2_longrun"),
        F.when((F.col("n") > 0) & (s2 > 0), F.round(eta, 6)).alias(
            "kpss_stat"
        ),
    )


def rayleigh_hour_uniformity(
    df: DataFrame, ts_col: str = "ts"
) -> DataFrame:
    """Rayleigh test of circular uniformity for time-of-day — "are
    events spread evenly around the 24 h clock or concentrated at a
    preferred hour", the CIRCULAR dial the linear hourly histograms
    (seasonal_hour_profile) cannot give a significance number for:
    hour 23 and hour 0 are neighbors on the circle, not range
    extremes. θ = 2π·(micros-into-day)/86.4e9; R̄ = |Σe^{iθ}|/n;
    z = n·R̄² (Mardia & Jupp §6.3), plus the circular mean hour.

    One scan: the angle is an exact-integer fraction of the day before
    the only trig call, and cos/sin ride the round-6 decimal parity
    recipe (the spectral_entropy rule — JVM and libm trig agree only
    to ~1 ulp, so raw double sums could diverge engines); the folds
    are exact decimal sums. Output one row:
    (n, resultant_len, rayleigh_z, mean_hour)."""
    micros = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) % 86400000000"
    )
    theta = (
        F.lit(2.0 * 3.141592653589793)
        * micros.cast("double")
        / F.lit(86400000000.0)
    )
    base = df.filter(F.col(ts_col).isNotNull()).select(
        F.round(F.cos(theta), 6).cast("decimal(8,6)").alias("cw"),
        F.round(F.sin(theta), 6).cast("decimal(8,6)").alias("sw"),
    )
    folded = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cw").cast("decimal(38,6)")).alias("c"),
        F.sum(F.col("sw").cast("decimal(38,6)")).alias("s"),
    )
    from .hypotests import dec_double_wide_frac

    # staged projections: expanding the wide-split + atan2 + when
    # duplications in ONE projection generates >10k lines of Java and
    # kicks the (1-row) stage out of codegen — stage the scalars
    pre = folded.select(
        "n",
        F.col("n").cast("double").alias("nd"),
        dec_double_wide_frac(F.col("c")).alias("cd"),
        dec_double_wide_frac(F.col("s")).alias("sd"),
    )
    cd, sd, nd = F.col("cd"), F.col("sd"), F.col("nd")
    mid = pre.select(
        "n",
        "nd",
        (F.sqrt(cd * cd + sd * sd) / nd).alias("rbar"),
        (
            F.atan2(sd, cd)
            / F.lit(2.0 * 3.141592653589793)
            * F.lit(24.0)
        ).alias("h0"),
    )
    hour = F.when(F.col("h0") < 0, F.col("h0") + F.lit(24.0)).otherwise(
        F.col("h0")
    )
    rbar = F.col("rbar")
    return mid.select(
        F.col("n").cast("long").alias("n"),
        F.when(F.col("n") > 0, F.round(rbar, 6)).alias("resultant_len"),
        F.when(F.col("n") > 0, F.round(nd * rbar * rbar, 6)).alias(
            "rayleigh_z"
        ),
        F.when(F.col("n") > 0, F.round(hour, 6)).alias("mean_hour"),
    )


def pacf_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Partial autocorrelation of the daily-total series at lags 1-3
    via the Durbin–Levinson recursion unrolled in closed form — the AR
    ORDER-SELECTION dial next to ``acf_daily``: ACF says "lag k is
    correlated", PACF says "lag k still matters AFTER lags 1..k−1",
    which is what picks p for an AR(p) baseline (φ_kk ≈ 0 beyond the
    true order).

    Same machinery as acf_daily: one fact shuffle to the bounded day
    relation, calendar lag-pairing self-join, exact decimal inner sums
    (Σy·y₊ₖ, ΣA, ΣB per lag), one fixed double closing sequence. The
    DL recursion (φ11 = ρ1; φ22 = (ρ2 − φ11ρ1)/(1 − φ11ρ1);
    φ21 = φ11 − φ22φ11; φ33 = (ρ3 − φ21ρ2 − φ22ρ1)/(1 − φ21ρ1 −
    φ22ρ2)) closes over the three ρ scalars in STAGED projections so
    both engines evaluate the identical expression tree (and codegen
    never sees the expanded duplication). Output one row:
    (n_days, rho1, rho2, rho3, pacf1, pacf2, pacf3)."""
    from .hypotests import dec_double

    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    y = F.col(value_col).cast("decimal(18,2)")
    daily = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(day.alias("day"), y.alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"))
        .persist()
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("q"),
    )
    lagged = daily.select(
        "day", "y", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("lag")
    )
    d2 = daily.select(F.col("day").alias("day2"), F.col("y").alias("y2"))
    pairs = lagged.join(d2, lagged.day + lagged.lag == d2.day2)
    per_lag = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("y") * F.col("y2")).cast("decimal(38,4)")).alias("p"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("a"),
        F.sum(F.col("y2").cast("decimal(38,2)")).alias("b"),
    )
    n = F.col("n").cast("double")
    m = dec_double(F.col("s")) / n
    den = dec_double(F.col("q")) - dec_double(F.col("s")) * m
    num = (
        dec_double(F.col("p"))
        - m * (dec_double(F.col("a")) + dec_double(F.col("b")))
        + F.col("n_pairs").cast("double") * m * m
    )
    rho = F.when(den > 0, F.round(num / den, 6))
    # no-groupBy pivot + tot crossJoin: an EMPTY pair relation (n_days
    # < 2) must still yield one row with NULL rhos, not zero rows (the
    # hill_tail empty-relation-annihilation class)
    pivoted = (
        per_lag.crossJoin(F.broadcast(tot))
        .select("lag", rho.alias("rho"))
        .agg(
            *[
                F.max(F.when(F.col("lag") == k, F.col("rho"))).alias(
                    f"rho{k}"
                )
                for k in (1, 2, 3)
            ]
        )
    )
    wide = tot.select("n").crossJoin(F.broadcast(pivoted))
    r1, r2, r3 = F.col("rho1"), F.col("rho2"), F.col("rho3")
    # Durbin-Levinson denominators guarded (same den != 0 CASE style
    # as rho): a short or perfectly linear series with rho1 = ±1 must
    # yield NULL pacf2/pacf3, never ±Inf/NaN. A NULL p22 cascades to
    # p21 and pacf3 identically on both engines.
    den2 = F.lit(1.0) - r1 * r1
    s1 = wide.select(
        "n", "rho1", "rho2", "rho3",
        r1.alias("p11"),
        F.when(den2 != 0, (r2 - r1 * r1) / den2).alias("p22"),
    )
    s2 = s1.select(
        "*",
        (F.col("p11") - F.col("p22") * F.col("p11")).alias("p21"),
    )
    den3 = (
        F.lit(1.0)
        - F.col("p21") * F.col("rho1")
        - F.col("p22") * F.col("rho2")
    )
    p33 = F.when(
        den3 != 0,
        (
            F.col("rho3")
            - F.col("p21") * F.col("rho2")
            - F.col("p22") * F.col("rho1")
        )
        / den3,
    )
    result = s2.select(
        F.col("n").cast("long").alias("n_days"),
        "rho1", "rho2", "rho3",
        F.col("p11").alias("pacf1"),
        F.round(F.col("p22"), 6).alias("pacf2"),
        F.round(p33, 6).alias("pacf3"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def seasonal_strength_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """STL-style seasonal-strength decomposition of the daily series —
    the [0,1] "how much of the non-trend variation is weekly rhythm"
    number (Wang-Smith-Hyndman feature): strength =
    max(0, 1 − Var(remainder)/Var(detrended)) with trend a CENTERED
    period-window moving average and seasonal the per-weekday mean of
    the detrended series. seasonal_weekday_value reports the weekday
    MEANS; this reports how much they explain.

    One fact shuffle to the persisted day relation; the trend is a
    RANGE window (calendar-true: gap days shrink the window, never
    shift it); weekday = day % period on the INTEGER epoch-day (label
    anchor irrelevant to variance explained). Per-weekday means and
    both variances fold as floor(·10⁶) fixed point, so both engines
    agree bit-exactly. Output one row:
    (n_days, var_detrended, var_residual, seasonal_strength)."""
    from .dedup import _release_caches
    from .hypotests import dec_double_wide

    half = (period - 1) // 2
    daily = _daily_series(df, ts_col, value_col).persist()
    w_ma = Window.orderBy("day").rangeBetween(-half, half)
    base = daily.select(
        F.expr(f"day % {period}").alias("dow"),
        (
            F.col("y").cast("double")
            - F.sum("y").over(w_ma).cast("double")
            / F.count("y").over(w_ma).cast("double")
        ).alias("detr"),
    )
    d38 = "decimal(38,0)"
    dmeans = base.groupBy("dow").agg(
        F.sum(F.floor(F.col("detr") * F.lit(1e6)).cast(d38)).alias(
            "sd_fp"
        ),
        F.count(F.lit(1)).alias("c"),
    )
    seasonal = (
        dec_double_wide(F.col("sd_fp"))
        / F.lit(1e6)
        / F.col("c").cast("double")
    )
    joined = base.join(F.broadcast(dmeans), "dow").select(
        "detr", (F.col("detr") - seasonal).alias("resid")
    )
    folded = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("detr") * F.col("detr") * F.lit(1e6)).cast(d38)
        ).alias("dd_fp"),
        F.sum(F.floor(F.col("detr") * F.lit(1e6)).cast(d38)).alias(
            "d_fp"
        ),
        F.sum(
            F.floor(F.col("resid") * F.col("resid") * F.lit(1e6)).cast(
                d38
            )
        ).alias("rr_fp"),
        F.sum(F.floor(F.col("resid") * F.lit(1e6)).cast(d38)).alias(
            "r_fp"
        ),
    )
    nd = F.col("n").cast("double")
    md = dec_double_wide(F.col("d_fp")) / F.lit(1e6) / nd
    mr = dec_double_wide(F.col("r_fp")) / F.lit(1e6) / nd
    var_d = dec_double_wide(F.col("dd_fp")) / F.lit(1e6) / nd - md * md
    var_r = dec_double_wide(F.col("rr_fp")) / F.lit(1e6) / nd - mr * mr
    strength = F.greatest(
        F.lit(0.0), F.lit(1.0) - var_r / var_d
    )
    result = folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.when(F.col("n") > 0, F.round(var_d, 6)).alias("var_detrended"),
        F.when(F.col("n") > 0, F.round(var_r, 6)).alias("var_residual"),
        F.when((F.col("n") > 0) & (var_d > 0), F.round(strength, 6))
        .alias("seasonal_strength"),
    )
    return _release_caches(result, [daily])


def bh_fdr_daily_counts(
    df: DataFrame, ts_col: str = "ts", q: float = 0.05
) -> DataFrame:
    """Benjamini–Hochberg FDR screen over the per-day event-count
    z-scores — "WHICH days are anomalous, with the false-discovery
    rate controlled at q" — the multiple-testing closer the single-day
    dials (dispersion_daily_events, rolling_count_anomaly) need before
    anyone pages an on-call: testing 365 days at p < 0.05 expects ~18
    false alarms; BH caps the expected false-discovery FRACTION at q.

    Under the global Poisson rate λ = N/m, z_d = (c_d − λ)/√λ and the
    two-sided p_d = 2·P(Z > |z_d|) ride the portable A&S normal tail
    (norm_sf), snapped to the round-6 grid before ranking (the score-
    grid rule). The BH walk — k = max{i: p_(i) ≤ q·i/m} — is a rank
    window over the BOUNDED day relation and two conditional folds.
    Output one row: (m_days, n_significant, bh_threshold, min_p)."""
    from .hypotests import norm_sf

    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .select(day.alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("m"), F.sum("c").alias("n")
    )
    lam = F.col("n").cast("double") / F.col("m").cast("double")
    z = (F.col("c").cast("double") - lam) / F.sqrt(lam)
    p6 = F.round(F.lit(2.0) * norm_sf(F.abs(z)), 6)
    base = daily.crossJoin(F.broadcast(tot)).select(
        "day", "m", p6.alias("p")
    )
    w = Window.orderBy(F.asc("p"), F.asc("day"))
    ranked = base.select(
        "m",
        "p",
        F.row_number().over(w).alias("i"),
    )
    cond = F.col("p") <= F.lit(q) * F.col("i").cast("double") / F.col(
        "m"
    ).cast("double")
    folded = ranked.agg(
        F.max("m").alias("m"),
        F.max(F.when(cond, F.col("i"))).alias("khat"),
        F.max(F.when(cond, F.col("p"))).alias("thresh"),
        F.min("p").alias("min_p"),
    )
    return folded.select(
        F.col("m").cast("long").alias("m_days"),
        F.coalesce(F.col("khat"), F.lit(0)).cast("long").alias(
            "n_significant"
        ),
        F.col("thresh").alias("bh_threshold"),
        F.col("min_p").alias("min_p"),
    )


def bartels_rank_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Bartels (1982) rank von Neumann ratio on the daily-total series
    — the RANK version of the serial-randomness ratio, robust where
    durbin_watson's raw residual squares chase outliers: RVN =
    Σ(R_t − R_{t+1})² / Σ(R_t − R̄)², E = 2, and under the null
    z = (RVN − 2)/√(4/n) (large-sample form, no-ties variance;
    midranks keep ties exact in the ratio itself).

    The fact table collapses to the bounded day relation; ranks and
    the lag walk are windows over that ≤ #days-row relation only.
    Midranks are exact half-units (2R = rank window via cumulative
    count), every fold is exact integer/quarter-unit decimal. Output
    one row: (n_days, rvn_ratio, z_score)."""
    from .hypotests import dec_double_wide

    daily = _daily_series(df, ts_col, value_col)
    win = Window.orderBy("day")
    # midrank in half-units over the bounded day relation: 2R = 2*rank
    # adjusted for ties via min/max rank of equal values — daily totals
    # are exact decimals, ties are rare but handled exactly
    wv = Window.orderBy("y")
    ranked = daily.select(
        "day",
        (
            F.lit(2) * F.row_number().over(wv)
        ).alias("rr2_raw"),
        "y",
    )
    # equal y values share the midrank: average the row_numbers per y
    mid = ranked.groupBy("y").agg(
        F.sum("rr2_raw").alias("sum2"), F.count(F.lit(1)).alias("c")
    )
    r2 = (
        ranked.join(F.broadcast(mid), "y")
        .select(
            "day",
            (F.col("sum2") / F.col("c")).cast("long").alias("r2"),
        )
    )
    walked = r2.select(
        "r2", F.lead("r2").over(win).alias("r2n")
    )
    folded = walked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2").alias("s2"),
        F.sum(
            (
                F.col("r2").cast("decimal(19,0)")
                * F.col("r2").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("q4"),
        F.sum(
            (
                (F.col("r2") - F.col("r2n")).cast("decimal(19,0)")
                * (F.col("r2") - F.col("r2n")).cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("d4"),
    )
    nd = F.col("n").cast("double")
    num = dec_double_wide(F.col("d4")) / F.lit(4.0)
    mean_r = F.col("s2").cast("double") / F.lit(2.0) / nd
    den = (
        dec_double_wide(F.col("q4")) / F.lit(4.0)
        - nd * mean_r * mean_r
    )
    rvn = num / den
    z = (rvn - F.lit(2.0)) / F.sqrt(F.lit(4.0) / nd)
    return folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.when((F.col("n") > 1) & (den > 0), F.round(rvn, 6)).alias(
            "rvn_ratio"
        ),
        F.when(
            (F.col("n") > 1) & (den > 0), F.round(z, 6)
        ).alias("z_score"),
    )


def difference_sign_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Difference-sign randomness test on the daily-total series:
    count ascents (y_t > y_{t−1}); under i.i.d. noise E = (n−1)/2,
    Var = (n+1)/12 (Brockwell & Davis §1.6) — a MONOTONE-TREND
    detector that complements turning_points (which sees alternation)
    and mann_kendall (which weighs all pairs, not just neighbors).
    Strict inequality: ties count as non-ascents (documented; exact
    decimal daily totals rarely tie).

    One fact shuffle to the bounded day relation; one lag window over
    it. Output one row: (n_days, n_ascents, expected, z_score)."""
    daily = _daily_series(df, ts_col, value_col)
    win = Window.orderBy("day")
    walked = daily.select(
        "y", F.lag("y").over(win).alias("yp")
    ).filter(F.col("yp").isNotNull())
    folded = walked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("y") > F.col("yp"), 1).otherwise(0)).alias(
            "asc"
        ),
    )
    n = F.col("m").cast("double") + F.lit(1.0)
    mean = (n - F.lit(1.0)) / F.lit(2.0)
    var = (n + F.lit(1.0)) / F.lit(12.0)
    return folded.select(
        (F.col("m") + F.lit(1)).cast("long").alias("n_days"),
        F.col("asc").cast("long").alias("n_ascents"),
        F.round(mean, 6).alias("expected"),
        F.when(
            var > 0,
            F.round(
                (F.col("asc").cast("double") - mean) / F.sqrt(var), 6
            ),
        ).alias("z_score"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """Seasonal Mann–Kendall trend test (Hirsch & Slack 1984) on the
    daily-total series — the trend detector that a weekly rhythm
    cannot fool: pairs are compared only WITHIN a season (same weekday
    here), so Monday-vs-Saturday level differences never masquerade as
    trend. S = Σ_g S_g over within-season pairs,
    Var = Σ_g tie-corrected Var_g, continuity-corrected z.

    Same calendar-bounded machinery as ``mann_kendall_daily``: the
    pair join adds the season-equality predicate (≈1/period the
    pairs); everything integer/exact-decimal until the closing z.
    Output one row: (n_days, n_seasons, s_stat, var_s, z_score)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    y = F.col(value_col).cast("decimal(18,2)")
    daily = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(day.alias("day"), y.alias("y"))
        .groupBy("day")
        .agg(F.sum("y").alias("y"))
        .select(
            "day", "y", F.expr(f"day % {period}").alias("season")
        )
        .persist()
    )
    d2 = daily.select(
        F.col("day").alias("day2"),
        F.col("y").alias("y2"),
        F.col("season").alias("season2"),
    )
    s = daily.join(
        d2,
        (F.col("day") < F.col("day2"))
        & (F.col("season") == F.col("season2")),
    ).agg(
        F.sum(F.signum(F.col("y2") - F.col("y")).cast("long")).alias("s")
    )
    n_t = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("season")).alias("n_seasons"),
    )
    # per-season n and per-(season, y) ties fold into Var = sum_g
    # (n_g(n_g-1)(2n_g+5) - sum_t t(t-1)(2t+5))/18
    n_g = F.col("c").cast("decimal(19,0)")
    per_season = daily.groupBy("season").agg(
        F.count(F.lit(1)).alias("c")
    )
    var_n = per_season.agg(
        F.sum(
            (n_g * (n_g - 1) * (2 * n_g + 5)).cast("decimal(38,0)")
        ).alias("var_n")
    )
    t = F.col("c").cast("decimal(19,0)")
    ties = (
        daily.groupBy("season", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(
                (t * (t - 1) * (2 * t + 5)).cast("decimal(38,0)")
            ).alias("tie_sum")
        )
    )
    var_s = (
        F.col("var_n") - F.coalesce(F.col("tie_sum"), F.lit(0))
    ).cast("double") / F.lit(18.0)
    s_d = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (s_d - 1.0) / F.sqrt(var_s))
        .when(F.col("s") < 0, (s_d + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    result = (
        n_t.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(var_n))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("n_seasons").cast("long").alias("n_seasons"),
            F.col("s").cast("long").alias("s_stat"),
            F.when(F.col("n") > 1, F.round(var_s, 6)).alias("var_s"),
            F.when(
                (F.col("n") > 1) & (var_s > 0), F.round(z, 6)
            ).alias("z_score"),
        )
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def chatterjee_xi_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Chatterjee's ξ rank correlation (2020) between the per-day
    event COUNT and the per-day total VALUE — the modern dependence
    coefficient that detects ANY functional relationship (ξ → 1 when
    y is a measurable function of x, even non-monotone, where
    Pearson/Spearman/Kendall read ≈ 0): sort days by x, walk the y
    ranks, ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)) (the
    tie-robust denominator form). Chatterjee breaks x-ties at RANDOM;
    this engine breaks them by day (deterministic, documented — the
    same convention class as the strict-inequality turning_points).

    One fact shuffle to the bounded day relation; ranks are joins
    against the bounded per-y cumulative relation; the |Δr| walk is
    one lead window in (x, day) order. All-integer until the closing
    ratio. Output one row: (n_days, sum_abs_dr, denom, xi)."""
    from .hypotests import dec_double_wide

    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000"
    )
    daily = (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            day.alias("day"),
            F.col(value_col).cast("decimal(18,2)").alias("v"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum("v").alias("y"),
        )
        # Drop all-NULL-value days BEFORE the y-rank window: a NULL y
        # group would sort NULLS FIRST here but NULLS LAST in the
        # DuckDB twin, silently skewing every cumulative rank r (the
        # engines disagree on NULL placement, so parity demands the
        # NULL group never reaches the window — same convention as the
        # _daily_series operators).
        .filter(F.col("y").isNotNull())
    )
    yc = daily.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    ycum = yc.select(
        "y",
        "c",
        F.sum("c").over(wy).alias("r"),  # r(y) = #{j: y_j <= y}
    )
    joined = daily.join(F.broadcast(ycum), "y").select(
        "day", "x", "r", "c"
    )
    wx = Window.orderBy(F.asc("x"), F.asc("day"))
    walked = joined.select(
        "r",
        "c",
        F.lead("r").over(wx).alias("rn"),
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"))
    folded = walked.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.sum(F.abs(F.col("r") - F.col("rn"))).alias("sum_dr"),
        # sum over DAYS of l_i(n - l_i), l_i = n - (r_i - c_i): each
        # distinct y contributes c copies
        F.sum(
            (
                (F.col("n") - (F.col("r") - F.col("c"))).cast(
                    "decimal(19,0)"
                )
                * (F.col("r") - F.col("c")).cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("denom2"),
    )
    nd = F.col("n").cast("double")
    xi = F.lit(1.0) - nd * F.col("sum_dr").cast("double") / (
        F.lit(2.0) * dec_double_wide(F.col("denom2"))
    )
    return folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("sum_dr").cast("long").alias("sum_abs_dr"),
        F.col("denom2").cast("long").alias("denom"),
        F.when(F.col("denom2") > 0, F.round(xi, 6)).alias("xi"),
    )


def pettitt_changepoint(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Pettitt (1979) rank-based change-point test on the daily-total
    series — "did the level shift, and on which day": U_t = Σ_{i≤t}
    Σ_{j>t} sgn(y_i − y_j), K = max_t |U_t|, with the approximate
    two-sided p = min(1, 2·exp(−6K²/(n³+n²))). The nonparametric
    Mann-Whitney-flavored changepoint detector that cusum_daily's
    mean-based statistic complements.

    NOT the O(n²) pair sum: with midranks r_i the inner sgn sum
    collapses to 2r_i − (n+1) exactly (the within-prefix part is
    antisymmetric and cancels), so U_t = cumsum(2r)_t − t·(n+1) —
    ALL-INTEGER via the doubled midrank u = 2·cum − c + 1 from the
    bounded distinct-y relation. One fact shuffle to the day relation;
    ranks join against the bounded per-y cumulative; the walk is one
    cumulative window over ≤ #days rows. K and the argmax day close
    via global aggregates only (1-row guarantee on empty input — the
    wasserstein annihilation lesson); change_day ties break to the
    EARLIEST day (deterministic, documented). Output one row:
    (n_days, k_stat, change_day, p_approx)."""
    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    yc = daily.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    ycum = yc.select(
        "y",
        "c",
        F.sum("c").over(wy).alias("cum"),
    )
    u = (
        F.lit(2) * F.col("cum") - F.col("c") + F.lit(1)
    ).cast("long")
    joined = daily.join(F.broadcast(ycum), "y").select(
        "day", u.alias("u")
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"))
    wd = Window.orderBy("day")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    stepped = (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            F.row_number().over(wd).alias("t"),
            F.sum("u").over(wcum).alias("cu"),
        )
        .filter(F.col("t") < F.col("n"))
        .select(
            "day",
            (
                F.col("cu") - F.col("t").cast("long") * (F.col("n") + F.lit(1))
            ).alias("ut"),
        )
    )
    kk = stepped.agg(F.max(F.abs(F.col("ut"))).alias("k_stat"))
    arg = (
        stepped.crossJoin(F.broadcast(kk))
        .filter(F.abs(F.col("ut")) == F.col("k_stat"))
        .agg(F.min("day").alias("change_day"))
    )
    final = tot.crossJoin(F.broadcast(kk)).crossJoin(F.broadcast(arg))
    nd = F.col("n").cast("double")
    kd = F.col("k_stat").cast("double")
    p = F.least(
        F.lit(1.0),
        F.lit(2.0)
        * F.exp(
            F.lit(-6.0) * kd * kd / (nd * nd * nd + nd * nd)
        ),
    )
    result = final.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("k_stat").cast("long").alias("k_stat"),
        F.col("change_day").cast("long").alias("change_day"),
        F.when(F.col("n") > 1, F.round(p, 6)).alias("p_approx"),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def foster_stuart_records(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Foster–Stuart records test on the daily-total series: count
    upper records (y_t strictly above every previous day) and lower
    records; d = U − L detects TREND (records pile up on one side),
    s = U + L detects dispersion change. Under i.i.d., upper/lower
    record indicators at time t are independent Bernoulli(1/t) and
    mutually exclusive, so E[d] = 0, Var(d) = Σ_{t=2..n} 2/t,
    E[s] = Σ 2/t, Var(s) = Σ (2/t − 4/t²) — the records-based
    randomness check that complements turning_points (alternation)
    and difference_sign (ascents): records see SLOW drifts both miss.

    One fact shuffle to the bounded day relation; running max/min are
    prefix windows over ≤ #days rows; the harmonic moment terms fold
    as round(·,12)-decimal sums (k-term double folds are
    order-nondeterministic across engines; these stay far under 15
    significant digits, so the closing direct double cast is exactly
    rounded on both). First day is excluded (records start at t = 2;
    strict inequality — exact-decimal daily totals tie only on equal
    totals, which count as non-records, documented). Output one row:
    (n_days, n_upper, n_lower, d_stat, s_stat, z_trend, z_disp)."""
    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    wd = Window.orderBy("day")
    wprev = wd.rowsBetween(Window.unboundedPreceding, -1)
    walked = daily.select(
        "y",
        F.row_number().over(wd).alias("t"),
        F.max("y").over(wprev).alias("pmax"),
        F.min("y").over(wprev).alias("pmin"),
    ).filter(F.col("t") >= 2)
    td = F.col("t").cast("double")
    d12 = "decimal(38,12)"
    folded = walked.agg(
        F.sum(
            F.when(F.col("y") > F.col("pmax"), 1).otherwise(0)
        ).alias("u"),
        F.sum(
            F.when(F.col("y") < F.col("pmin"), 1).otherwise(0)
        ).alias("l"),
        F.sum(F.round(F.lit(2.0) / td, 12).cast(d12)).alias("vd12"),
        F.sum(
            F.round(
                F.lit(2.0) / td - F.lit(4.0) / (td * td), 12
            ).cast(d12)
        ).alias("vs12"),
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"))
    final = folded.crossJoin(F.broadcast(tot))
    ud = F.col("u").cast("double")
    ld = F.col("l").cast("double")
    vd = F.col("vd12").cast("double")
    vs = F.col("vs12").cast("double")
    result = final.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("u").cast("long").alias("n_upper"),
        F.col("l").cast("long").alias("n_lower"),
        (F.col("u") - F.col("l")).cast("long").alias("d_stat"),
        (F.col("u") + F.col("l")).cast("long").alias("s_stat"),
        F.when(vd > 0, F.round((ud - ld) / F.sqrt(vd), 6)).alias(
            "z_trend"
        ),
        F.when(vs > 0, F.round((ud + ld - vd) / F.sqrt(vs), 6)).alias(
            "z_disp"
        ),
    )
    from .dedup import _release_caches

    return _release_caches(result, [daily])


def permutation_entropy_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Bandt-Pompe permutation entropy (order 3) of the daily-total
    series: slide a 3-day window, map each triple to its ordinal
    pattern (one of 3! = 6), and take the Shannon entropy of the
    pattern distribution, normalized by ln 6 — the complexity measure
    that reads 1 for i.i.d. noise and drops toward 0 for regular
    dynamics, robust to any monotone transform of the values (it sees
    only ORDER). Complements sample_entropy (amplitude-based) and
    spectral_entropy (frequency-based).

    Ties break by TIME (earlier day ranks lower — the stable-argsort
    convention of the original paper). One fact shuffle to the bounded
    day relation; two lead windows; the pattern histogram is a ≤ 6-row
    groupBy. Entropy terms fold per the MI recipe (round-6 decimal,
    order-independent). Output one row:
    (n_triples, n_patterns, perm_entropy, normalized_pe)."""
    daily = _daily_series(df, ts_col, value_col)
    wd = Window.orderBy("day")
    trip = daily.select(
        F.col("y").alias("a"),
        F.lead("y", 1).over(wd).alias("b"),
        F.lead("y", 2).over(wd).alias("c"),
    ).filter(F.col("c").isNotNull())
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    lt = lambda u, v: F.when(u < v, 1).otherwise(0)  # noqa: E731
    le = lambda u, v: F.when(u <= v, 1).otherwise(0)  # noqa: E731
    # rank_i = #{j: y_j < y_i} + #{j earlier, y_j == y_i}: stable ranks
    ra = lt(b, a) + lt(c, a)
    rb = le(a, b) + lt(c, b)
    rc = le(a, c) + le(b, c)
    pat = ra * F.lit(100) + rb * F.lit(10) + rc
    hist = trip.groupBy(pat.alias("pattern")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # n as a window over the <=6-row histogram, not a second aggregate
    # branch off hist: the crossJoin(tot) shape re-expanded the whole
    # day-relation window pipeline into a second fact scan (the dunn
    # per_g class; r10 self-audit)
    hist = hist.select(
        "pattern",
        "cnt",
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    p = F.col("cnt").cast("double") / F.col("n").cast("double")
    term = p * F.log(p)
    folded = hist.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(-term, 6).cast("decimal(18,6)")).alias("h"),
    )
    h = F.col("h").cast("double")
    return folded.select(
        F.col("n").cast("long").alias("n_triples"),
        F.col("k").cast("long").alias("n_patterns"),
        F.when(F.col("n") > 0, F.round(h, 6)).alias("perm_entropy"),
        F.when(
            F.col("n") > 0,
            F.round(h / F.lit(1.791759469228055), 6),  # ln(6)
        ).alias("normalized_pe"),
    )


def variance_ratio_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    q: int = 5,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test on the daily-total series:
    VR(q) = Var(q-period increments)/(q·Var(1-period)) with the
    unbiased overlapping estimator m = q(n−q+1)(1−q/n); under a random
    walk VR = 1, and z = (VR−1)/√(2(2q−1)(q−1)/(3qn)) — the mean-
    reversion / momentum detector finance runs on anything cumulative
    (here: daily revenue). Complements hurst (R/S scaling) and
    bartels (rank serial dependence).

    Increments are over the OBSERVED day sequence (gap days join their
    neighbors — documented; the day relation is calendar-bounded).
    One fact shuffle to the day relation; both increment sets are lag
    windows over it. Per-row squared deviations fold as round-6
    decimals (the k-row double-fold rule). Output one row:
    (n_days, n_returns, vr_stat, z_score)."""
    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    wd = Window.orderBy("day")
    lagged = daily.select(
        F.col("y"),
        F.lag("y", 1).over(wd).alias("y1"),
        F.lag("y", q).over(wd).alias("yq"),
    )
    tot = lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.count("y1").alias("nr"),
        F.sum(
            (F.col("y") - F.col("y1")).cast("decimal(38,2)")
        ).alias("sr"),
    )
    from .dedup import _release_caches
    from .hypotests import dec_double_wide_frac

    j = lagged.crossJoin(F.broadcast(tot))
    mu = dec_double_wide_frac(F.col("sr")) / F.col("nr").cast("double")
    r1 = (F.col("y") - F.col("y1")).cast("double") - mu
    rq = (F.col("y") - F.col("yq")).cast("double") - mu * F.lit(float(q))
    folded = j.agg(
        F.max("n_days").alias("n_days"),
        F.max("nr").alias("nr"),
        F.max("sr").alias("sr"),
        F.sum(
            F.when(
                F.col("y1").isNotNull(),
                F.round(r1 * r1, 6).cast("decimal(38,6)"),
            )
        ).alias("d1"),
        F.sum(
            F.when(
                F.col("yq").isNotNull(),
                F.round(rq * rq, 6).cast("decimal(38,6)"),
            )
        ).alias("dq"),
    )
    n = F.col("nr").cast("double")
    var1 = dec_double_wide_frac(F.col("d1")) / (n - F.lit(1.0))
    mq = (
        F.lit(float(q))
        * (n - F.lit(float(q)) + F.lit(1.0))
        * (F.lit(1.0) - F.lit(float(q)) / n)
    )
    varq = dec_double_wide_frac(F.col("dq")) / mq
    vr = varq / (F.lit(float(q)) * var1)
    se = F.sqrt(
        F.lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) / n
    )
    ok = (F.col("nr") > q) & (var1 > 0) & (mq > 0)
    result = folded.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("nr").cast("long").alias("n_returns"),
        F.when(ok, F.round(vr, 6)).alias("vr_stat"),
        F.when(ok, F.round((vr - F.lit(1.0)) / se, 6)).alias("z_score"),
    )
    return _release_caches(result, [daily])


def buishand_range_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Buishand range test for a level shift in the daily-total series:
    partial sums of deviations S_k = Σ_{i≤k}(y_i − ȳ), rescaled range
    R/√n·σ̂ with R = max S_k − min S_k (and the max-|S_k| Q variant) —
    the MEAN-based changepoint companion to the rank-based
    ``pettitt_changepoint`` (Buishand 1982; sensitive to breaks in the
    middle of the record).

    S_k folds EXACTLY: S_k = cum_k − k·(S/n) with cum_k the decimal
    cumulative sum and one double multiply per day — no running double
    accumulation to diverge. One fact shuffle to the day relation; one
    cumulative window over it. Output one row:
    (n_days, q_stat, r_stat, q_scaled, r_scaled)."""
    from .dedup import _release_caches
    from .hypotests import dec_double_wide_frac

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("s"),
        F.sum(
            (F.col("y") * F.col("y")).cast("decimal(38,4)")
        ).alias("ss"),
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        F.sum(F.col("y").cast("decimal(38,2)")).over(wd).alias("cum"),
        F.row_number().over(Window.orderBy("day")).alias("k"),
    )
    n = F.col("n").cast("double")
    mean = dec_double_wide_frac(F.col("s")) / n
    sk = dec_double_wide_frac(F.col("cum")) - F.col("k").cast("double") * mean
    folded = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.max("ss").alias("ss"),
        F.max(F.abs(sk)).alias("q_stat"),
        F.max(sk).alias("s_max"),
        F.min(sk).alias("s_min"),
    )
    var = dec_double_wide_frac(F.col("ss")) / n - (
        dec_double_wide_frac(F.col("s")) / n
    ) * (dec_double_wide_frac(F.col("s")) / n)
    sd = F.sqrt(var)
    scale = sd * F.sqrt(n)
    rng = F.col("s_max") - F.col("s_min")
    ok = (F.col("n") > 1) & (var > 0)
    result = folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.when(F.col("n") > 0, F.round(F.col("q_stat"), 6)).alias(
            "q_stat"
        ),
        F.when(F.col("n") > 0, F.round(rng, 6)).alias("r_stat"),
        F.when(ok, F.round(F.col("q_stat") / scale, 6)).alias(
            "q_scaled"
        ),
        F.when(ok, F.round(rng / scale, 6)).alias("r_scaled"),
    )
    return _release_caches(result, [daily])


def snht_daily_value(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Alexandersson's SNHT (standard normal homogeneity test) on the
    daily-total series: T_k = k·z̄₁² + (n−k)·z̄₂² over every prefix
    split, T = max_k T_k — the GAUSSIAN-mean changepoint detector that
    completes the family (pettitt = rank-based, buishand = partial-sum
    range, SNHT = standardized-mean; the three disagree exactly when
    the break diagnosis is fragile, which is the point of shipping all
    three).

    ALL-INTEGER until one closing division: with prefix sums S_k the
    two standardized means share one numerator, z̄₂'s being the exact
    negative of z̄₁'s, so
    T_k = n·D_k / (k(n−k)(n·ΣC² − S²)) with D_k = (n·S_k − k·S)²
    — every factor an exact decimal cent integer. The argmax is taken
    on floor(10⁹·T_k) fixed point (floor of identical IEEE doubles is
    engine-independent; the grubbs dev_fp pattern), ties to the
    EARLIEST day; T is then recomputed at the winning row from its
    exact integers. One fact shuffle to the bounded day relation; one
    cumulative window; 1-row output guarantee on empty/degenerate
    input. Output: (n_days, t_stat, change_day)."""
    from .dedup import _release_caches
    from ..operators.hypotests import dec_double_wide

    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    d38 = "decimal(38,0)"
    base = daily.select(
        "day", (F.col("y") * F.lit(100)).cast(d38).alias("c")
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum((F.col("c") * F.col("c")).cast(d38)).alias("ss"),
    )
    wd = Window.orderBy("day")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    nn = F.col("n").cast("decimal(19,0)")
    kk = F.col("k").cast("decimal(19,0)")
    numl = (nn * F.col("cum")).cast(d38) - (kk * F.col("s")).cast(d38)
    stepped = (
        base.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            "s",
            "ss",
            F.row_number().over(wd).alias("k"),
            F.sum("c").over(wcum).alias("cum"),
        )
        .filter(F.col("k") < F.col("n"))
        .select(
            "day",
            "n",
            "k",
            (numl * numl).cast(d38).alias("d"),
            ((nn * F.col("ss")).cast(d38) - (F.col("s") * F.col("s")).cast(d38)).alias("den"),
        )
        .filter(F.col("den") > 0)
    )
    t_val = dec_double_wide((F.col("n").cast("decimal(19,0)") * F.col("d")).cast(d38)) / (
        (F.col("k").cast("double") * (F.col("n") - F.col("k")).cast("double"))
        * dec_double_wide(F.col("den"))
    )
    arg = stepped.agg(
        F.max(
            F.struct(
                F.floor(t_val * F.lit(1e9)).cast("long").alias("tq"),
                (-F.col("day")).cast("long").alias("nd"),
                F.col("d").alias("d"),
                F.col("den").alias("den"),
                F.col("k").alias("k"),
                F.col("n").alias("nw"),
            )
        ).alias("top")
    )
    final = tot.crossJoin(F.broadcast(arg))
    tw = dec_double_wide(
        (F.col("top.nw").cast("decimal(19,0)") * F.col("top.d")).cast(d38)
    ) / (
        (
            F.col("top.k").cast("double")
            * (F.col("top.nw") - F.col("top.k")).cast("double")
        )
        * dec_double_wide(F.col("top.den"))
    )
    result = final.select(
        F.col("n").cast("long").alias("n_days"),
        F.when(F.col("top").isNotNull(), F.round(tw, 6)).alias("t_stat"),
        F.when(F.col("top").isNotNull(), (-F.col("top.nd")).cast("long")).alias(
            "change_day"
        ),
    )
    return _release_caches(result, [daily])


def distance_correlation_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Székely's distance correlation between the daily TOTAL VALUE and
    the daily EVENT COUNT — dCor = 0 iff the two series are
    INDEPENDENT (any dependence, not just monotone: the gap left by
    pearson/spearman/chatterjee/hoeffding, which all condition on one
    direction of association). The standard "is volume driving
    revenue, at all" screen.

    The double-centering identity runs ALL-INTEGER: with distance
    matrices a_jk = |y_j − y_k| (exact cents) and b_jk = |m_j − m_k|
    (counts), U_jk = n²a_jk − n·ra_j − n·ra_k + ga (row sums ra,
    grand sum ga) is n²·Â_jk exactly, so n⁶·dCov² = ΣU·V,
    n⁶·dVar = ΣU², and dCor² = ΣUV/√(ΣU²·ΣV²) with the n⁶ CANCELLED —
    three exact decimal folds, one closing double sequence. The pair
    grid is CALENDAR-BOUNDED at days² rows (~10⁵ pairs for a one-year
    span, ~1.3×10⁷ for a decade; a three-century span is ~1.1×10⁵
    DAYS, hence ~1.2×10¹⁰ pairs — still fact-SF-independent, but no
    longer a broadcast-size relation). One fact shuffle to the day
    relation; the pair fold is one broadcast-joined aggregate. 1-row
    guarantee. Output: (n_days, dcor2, dcor).

    MAGNITUDE ENVELOPE (ADVICE r11, the dagostino discipline): the
    squared fold su2 = Σ U² ≤ 16·n⁶·R² where R = max−min of the daily
    cents (resp. daily counts for sv2), so a ~10-year span (n≈3.6×10³)
    with ~10⁹-cent daily ranges reaches ~10⁴⁰ — past DECIMAL(38,0) /
    HUGEINT, where Spark (ANSI off) silently NULLs while DuckDB
    errors: DIVERGENT failure modes. Both engines therefore apply the
    same exact digit-count guard BEFORE the fold —
    2 + 6·digits(n) + 2·max(digits(R_a), digits(R_b)) ≤ 38 guarantees
    every partial (|U| ≤ 4n²R, U², U·V, and the three sums) fits in 38
    digits — and emit NULL stats identically when it fails. Callers
    with long-span, large-magnitude data should pre-scale value_col by
    a constant (dCor is scale-invariant; truncation error then lands
    in the input quantization, not mid-fold overflow)."""
    from .dedup import _release_caches
    from ..operators.hypotests import dec_double_wide

    d38 = "decimal(38,0)"
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    daily2 = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(day.alias("day"), F.col(value_col).cast("decimal(18,2)").alias("y"))
        .groupBy("day")
        .agg(
            (F.sum("y") * F.lit(100)).cast(d38).alias("yc"),
            F.count(F.lit(1)).cast("decimal(19,0)").alias("m"),
        )
        .persist()
    )
    daily2.count()
    aa = daily2.select(
        F.col("day").alias("da"), F.col("yc").alias("ya"), F.col("m").alias("ma")
    )
    bb = daily2.select(
        F.col("day").alias("db"), F.col("yc").alias("yb"), F.col("m").alias("mb")
    )
    pairs = aa.crossJoin(bb).select(
        "da",
        "db",
        F.abs(F.col("ya") - F.col("yb")).cast(d38).alias("a"),
        F.abs(F.col("ma") - F.col("mb")).cast(d38).alias("b"),
    )
    rows = pairs.groupBy(F.col("da").alias("day")).agg(
        F.sum("a").alias("ra"), F.sum("b").alias("rb")
    )
    tot = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("ga"),
        F.sum("rb").alias("gb"),
    )
    ja = rows.select(
        F.col("day").alias("da"), F.col("ra").alias("ra_j"), F.col("rb").alias("rb_j")
    )
    jb = rows.select(
        F.col("day").alias("db"), F.col("ra").alias("ra_k"), F.col("rb").alias("rb_k")
    )
    nn = F.col("n").cast("decimal(19,0)")
    u = (
        (nn * nn * F.col("a")).cast(d38)
        - (nn * F.col("ra_j")).cast(d38)
        - (nn * F.col("ra_k")).cast(d38)
        + F.col("ga")
    ).cast(d38)
    v = (
        (nn * nn * F.col("b")).cast(d38)
        - (nn * F.col("rb_j")).cast(d38)
        - (nn * F.col("rb_k")).cast(d38)
        + F.col("gb")
    ).cast(d38)
    # Exact overflow guard (see docstring): digit-count bound computed
    # on the tiny persisted day relation; when it fails, the fold feed
    # is emptied so su2/sv2 come back NULL and the stats NULL — the
    # oracle applies the IDENTICAL guard, so both engines degrade the
    # same way instead of Spark-NULL vs DuckDB-error.
    tot1 = daily2.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.coalesce(
            (F.max("yc") - F.min("yc")).cast(d38), F.lit(0).cast(d38)
        ).alias("rng_a"),
        F.coalesce(
            (F.max("m") - F.min("m")).cast(d38), F.lit(0).cast(d38)
        ).alias("rng_b"),
    ).withColumn(
        "fits",
        (
            F.lit(2)
            + F.lit(6) * F.length(F.col("n_days").cast("string"))
            + F.lit(2)
            * F.greatest(
                F.length(F.col("rng_a").cast("string")),
                F.length(F.col("rng_b").cast("string")),
            )
        )
        <= F.lit(38),
    )
    folded = (
        pairs.join(F.broadcast(ja), "da")
        .join(F.broadcast(jb), "db")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tot1.select("fits")))
        .filter(F.col("fits"))
        .select(u.alias("u"), v.alias("v"), "n")
        .agg(
            F.max("n").alias("n"),
            F.sum((F.col("u") * F.col("v")).cast(d38)).alias("suv"),
            F.sum((F.col("u") * F.col("u")).cast(d38)).alias("su2"),
            F.sum((F.col("v") * F.col("v")).cast(d38)).alias("sv2"),
        )
    )
    final = tot1.select("n_days").crossJoin(F.broadcast(folded))
    dcor2 = dec_double_wide(F.col("suv")) / F.sqrt(
        dec_double_wide(F.col("su2")) * dec_double_wide(F.col("sv2"))
    )
    ok = (F.col("su2") > 0) & (F.col("sv2") > 0)
    result = final.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.when(ok, F.round(dcor2, 6)).alias("dcor2"),
        F.when(ok, F.round(F.sqrt(dcor2), 6)).alias("dcor"),
    )
    return _release_caches(result, [daily2])


def watson_u2_minute(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Watson's U² test of CIRCULAR uniformity for time-of-day at
    minute resolution — the rotation-invariant Cramér–von Mises
    variant (Watson 1961): U² = Σ(u_(i) − (2i−1)/(2n))² − n(ū − ½)²
    + 1/(12n), invariant to where the day "starts", which the linear
    KS/CvM statistics are not. Complements ``rayleigh_hour_uniformity``
    (Rayleigh only has power against UNIMODAL departure; U² catches
    bimodal load patterns — e.g. two rush hours — that Rayleigh calls
    uniform).

    ALL-INTEGER fold: with minute-of-day a ∈ [0,1440) and A = 1440,
    12n²A²·U² = 3P − 3n(2Σa − nA)² + nA² where
    P = Σ_i (2n·a_(i) − (2i−1)A)². The fact table collapses to the
    ≤1440-row minute-count relation (one map-side-combinable shuffle);
    each tied block at minute v occupying sorted positions lo..hi
    contributes 3cK² − 6AK·(2S₁) + 2A²·(6S₂) with K = 2n·v + A and the
    exact integer range sums 2S₁ = (lo+hi)c, 6S₂ = hi(hi+1)(2hi+1) −
    (lo−1)lo(2lo−1) — positions assigned to equal values are a fixed
    SET, so the per-block sum is tie-order-independent and needs no
    tiebreak. The only window runs over the bounded minute relation.
    One closing division via the wide split. MAGNITUDE ENVELOPE:
    every partial ≤ ~1.2×10⁸·n³ (worst case all events in one minute)
    → exact to n ≈ 9×10⁹ events (documented, the dagostino
    discipline). Pre-epoch timestamps take the positive
    residue ((µs % 86.4e9)+86.4e9) % 86.4e9. Output one row:
    (n, u2_stat)."""
    from .dedup import _release_caches
    from ..operators.hypotests import dec_double_wide

    d19 = "decimal(19,0)"
    d38 = "decimal(38,0)"
    minute = F.expr(
        f"((unix_micros(cast({ts_col} as timestamp)) % 86400000000)"
        f" + 86400000000) % 86400000000 div 60000000"
    )
    vc = (
        df.filter(F.col(ts_col).isNotNull())
        .select(minute.alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    vc.count()
    tot = vc.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast(d19).alias("n"),
        F.coalesce(
            F.sum((F.col("m").cast(d19) * F.col("c")).cast(d38)),
            F.lit(0).cast(d38),
        ).alias("sa"),
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        "m",
        F.col("c").cast(d19).alias("c"),
        F.sum("c").over(w).cast(d19).alias("hi"),
    )
    aa = F.lit(1440).cast(d19)
    lo = F.col("hi") - F.col("c") + F.lit(1).cast(d19)
    hi = F.col("hi")
    k = (
        F.lit(2).cast(d19) * F.col("n") * F.col("m").cast(d19) + aa
    ).cast(d38)
    s1x2 = ((lo + hi) * F.col("c")).cast(d38)
    s2x6 = (
        (hi * (hi + F.lit(1).cast(d19))).cast(d38)
        * (F.lit(2).cast(d19) * hi + F.lit(1).cast(d19))
        - ((lo - F.lit(1).cast(d19)) * lo).cast(d38)
        * (F.lit(2).cast(d19) * lo - F.lit(1).cast(d19))
    ).cast(d38)
    p3_v = (
        (F.lit(3).cast(d19) * F.col("c") * (k * k).cast(d38)).cast(d38)
        - (F.lit(6).cast(d19) * aa * (k * s1x2).cast(d38)).cast(d38)
        + (F.lit(2).cast(d19) * aa * aa * s2x6).cast(d38)
    ).cast(d38)
    folded = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(p3_v).alias("p3")
    )
    # empty input: the agg on zero rows emits NULL n — re-anchor from
    # tot so the 1-row guarantee holds with n = 0
    final = tot.select(
        F.col("n").alias("n0"), F.col("sa").alias("sa0")
    ).crossJoin(F.broadcast(folded.select("p3")))
    dev = (
        F.lit(2).cast(d19) * F.col("sa0")
        - (F.col("n0") * aa).cast(d38)
    ).cast(d38)
    t_int = (
        F.col("p3")
        - (F.lit(3).cast(d19) * F.col("n0") * (dev * dev).cast(d38)).cast(
            d38
        )
        + (F.col("n0") * aa * aa).cast(d38)
    ).cast(d38)
    nd = F.col("n0").cast("double")
    u2 = dec_double_wide(t_int) / (
        F.lit(12.0) * nd * nd * F.lit(2073600.0)
    )
    result = final.select(
        F.col("n0").cast("long").alias("n"),
        F.when(F.col("n0") > 0, F.round(u2, 6)).alias("u2_stat"),
    )
    return _release_caches(result, [vc])


def epps_pulley_daily(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Epps–Pulley (1983) / BHEP(β=1) normality test of the daily-total
    series — the characteristic-function statistic
    TEP = (1/n)Σ_{j,k} e^{−(y_j−y_k)²/2} − √2·Σ_j e^{−y_j²/4} + n/√3
    on the standardized daily values y = (x − x̄)/s (population s).
    Affine-invariant and consistent against ALL alternatives — the
    gap left by jarque_bera/dagostino (moment tests, blind to
    non-normality with matching 3rd/4th moments).

    The fact table collapses to the bounded day relation; y_j derives
    from EXACT integer moments ((n·c_j − S), n·SS − S²) through one
    fixed double sequence, so every exp() argument is the identical
    IEEE double on both engines. The pair grid is CALENDAR-BOUNDED at
    days² rows (the dcor contract). Each exp term rides the round-6
    decimal parity recipe (the spectral/VdW rule — JVM and libm exp
    agree only to ~1 ulp, so raw double folds could diverge); the two
    folds are exact decimal sums with ONE closing sequence. Zero
    variance or empty input → NULL stat (1-row guarantee).
    Output: (n_days, tep_stat)."""
    from .dedup import _release_caches
    from ..operators.hypotests import dec_double_wide

    d38 = "decimal(38,0)"
    daily = _daily_series(df, ts_col, value_col).persist()
    daily.count()
    base = daily.select(
        "day", (F.col("y") * F.lit(100)).cast(d38).alias("c")
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
        F.coalesce(F.sum("c"), F.lit(0).cast(d38)).alias("s"),
        F.coalesce(
            F.sum((F.col("c") * F.col("c")).cast(d38)), F.lit(0).cast(d38)
        ).alias("ss"),
    )
    nn = F.col("n")
    m2num = ((nn * F.col("ss")).cast(d38) - (F.col("s") * F.col("s")).cast(d38)).cast(d38)
    nd = nn.cast("double")
    # y_j = (c_j − S/n)/s_pop = (n·c_j − S)/√(n·SS − S²): one exact
    # integer numerator, one sqrt, one division — identical IEEE
    # sequence on both engines
    ys = (
        base.crossJoin(F.broadcast(tot))
        .filter(m2num > 0)
        .select(
            "day",
            (
                dec_double_wide(
                    ((nn * F.col("c")).cast(d38) - F.col("s")).cast(d38)
                )
                / F.sqrt(dec_double_wide(m2num))
            ).alias("y"),
        )
    )
    pa = ys.select(F.col("y").alias("ya"))
    pb = ys.select(F.col("y").alias("yb"))
    dy = F.col("ya") - F.col("yb")
    pair_term = F.round(F.exp(dy * dy / F.lit(-2.0)), 6).cast(
        "decimal(8,6)"
    )
    sum1 = pa.crossJoin(pb).agg(
        F.coalesce(
            F.sum(pair_term.cast("decimal(38,6)")), F.lit(0).cast("decimal(38,6)")
        ).alias("s1")
    )
    one_term = F.round(
        F.exp(F.col("y") * F.col("y") / F.lit(-4.0)), 6
    ).cast("decimal(8,6)")
    sum2 = ys.agg(
        F.coalesce(
            F.sum(one_term.cast("decimal(38,6)")), F.lit(0).cast("decimal(38,6)")
        ).alias("s2")
    )
    from ..operators.hypotests import dec_double_wide_frac

    final = tot.crossJoin(F.broadcast(sum1)).crossJoin(F.broadcast(sum2))
    tep = (
        dec_double_wide_frac(F.col("s1")) / nd
        - F.sqrt(F.lit(2.0)) * dec_double_wide_frac(F.col("s2"))
        + nd / F.sqrt(F.lit(3.0))
    )
    ok = (nn > 0) & (m2num > 0)
    result = final.select(
        nn.cast("long").alias("n_days"),
        F.when(ok, F.round(tep, 6)).alias("tep_stat"),
    )
    return _release_caches(result, [daily])
