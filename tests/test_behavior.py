"""Behavioral analytics: funnel ordering semantics, cohort retention
invariants, and approximate-percentile error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_etl_spark.operators.behavior import funnel_steps, retention_cohorts
from breweries_etl_spark.sources.tables import load_events


def test_funnel_is_monotone_and_ordered(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    row = funnel_steps(ev).first()
    assert row.n_step1 >= row.n_step2 >= row.n_step3
    assert row.n_step1 > 0


def test_funnel_respects_event_order(spark):
    # u1 completes in order; u2 purchased BEFORE clicking -> not step3;
    # u3 clicked before viewing -> not step2.
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, None),
        (2, "2024-01-01 00:10:00", 1, "click", 1.0, None),
        (3, "2024-01-01 00:20:00", 1, "purchase", 1.0, None),
        (4, "2024-01-01 00:00:00", 2, "purchase", 1.0, None),
        (5, "2024-01-01 00:10:00", 2, "view", 1.0, None),
        (6, "2024-01-01 00:20:00", 2, "click", 1.0, None),
        (7, "2024-01-01 00:00:00", 3, "click", 1.0, None),
        (8, "2024-01-01 00:10:00", 3, "view", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    row = funnel_steps(ev).first()
    assert (row.n_step1, row.n_step2, row.n_step3) == (3, 2, 1)


def test_retention_day_zero_covers_every_user(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    ret = retention_cohorts(ev)
    day0 = ret.where(F.col("day_offset") == 0).agg(
        F.sum("n_active_users").alias("n")
    ).first()["n"]
    n_users = ev.select("user_id").distinct().count()
    assert day0 == n_users
    assert ret.where(F.col("day_offset") < 0).count() == 0


def test_value_trend_strategies_agree(spark, sf_dir):
    from breweries_etl_spark.operators.behavior import value_trend, value_trend_pandas

    ev = load_events(spark, sf_dir)
    native = {(r.user_id): (r.slope_per_hour, r.n_events) for r in value_trend(ev).collect()}
    arrow = {
        (r.user_id): (r.slope_per_hour, r.n_events)
        for r in value_trend_pandas(ev).collect()
    }
    assert native == arrow and len(native) > 0


def test_value_trend_known_slope(spark):
    # value rises exactly 2.0 per hour for one user -> slope 2.0
    rows = [
        (i, f"2024-01-01 0{i}:00:00", 7, "view", 10.0 + 2.0 * i, None)
        for i in range(5)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    from breweries_etl_spark.operators.behavior import value_trend

    r = value_trend(ev).first()
    assert r.slope_per_hour == 2.0 and r.n_events == 5


def test_approx_percentiles_within_tolerance(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    approx = orders.agg(
        *[
            F.percentile_approx("o_totalprice", p, 10_000).alias(f"p{int(p * 100)}")
            for p in (0.5, 0.9, 0.99)
        ]
    ).first()
    exact = orders.agg(
        *[
            F.expr(f"percentile(o_totalprice, {p})").alias(f"p{int(p * 100)}")
            for p in (0.5, 0.9, 0.99)
        ]
    ).first()
    for k in ("p50", "p90", "p99"):
        assert abs(approx[k] - exact[k]) / exact[k] < 0.01
