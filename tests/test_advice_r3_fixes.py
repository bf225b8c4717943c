"""Regression tests for the round-3 ADVICE items: snapshot_diff digest
injectivity, ab_test_stats arm guards, and temporal id_col
configurability."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from breweries_etl_spark.operators.behavior import ab_test_stats
from breweries_etl_spark.operators.merge import snapshot_diff
from breweries_etl_spark.operators.temporal import (
    downsample_first_per_bucket,
    event_gap_stats,
    rolling_time_window,
)


# ------------------------------------------------------- snapshot_diff
def test_snapshot_diff_separator_collision_detected(spark):
    """('x\\x1fvy','z') vs ('x','y\\x1fvz') concatenate identically under
    a bare concat_ws digest; the length-prefixed encoding must classify
    the row as changed."""
    old = spark.createDataFrame([Row(k=1, a="x\x1fvy", b="z")])
    new = spark.createDataFrame([Row(k=1, a="x", b="y\x1fvz")])
    out = {r["status"]: r["n_keys"] for r in snapshot_diff(old, new, "k").collect()}
    assert out == {"changed": 1}


def test_snapshot_diff_null_vs_sentinel_and_unchanged(spark):
    old = spark.createDataFrame([Row(k=1, a=None, b="n"), Row(k=2, a="v", b="w")])
    new = spark.createDataFrame([Row(k=1, a="n", b="n"), Row(k=2, a="v", b="w")])
    out = {r["status"]: r["n_keys"] for r in snapshot_diff(old, new, "k").collect()}
    assert out == {"changed": 1, "unchanged": 1}


# ------------------------------------------------------- ab_test_stats
def test_ab_test_stats_rejects_non_two_arms(spark):
    df = spark.createDataFrame([Row(user_id=1, value=1.0)])
    with pytest.raises(ValueError, match="two-arm"):
        ab_test_stats(df, buckets=3)


def test_ab_test_stats_degenerate_arm_null_variance(spark):
    # Find two user ids hashing to different arms, one row each: both
    # arms have n=1 so var and z must surface as NULL, not divide-by-
    # zero artifacts.
    from breweries_etl_spark.operators.sampling import hash_bucket_expr

    probe = spark.createDataFrame([Row(user_id=i) for i in range(20)]).select(
        "user_id", F.pmod(hash_bucket_expr(F.col("user_id")), F.lit(2)).alias("arm")
    )
    by_arm = {r["arm"]: r["user_id"] for r in probe.collect()}
    df = spark.createDataFrame(
        [Row(user_id=by_arm[0], value=1.0), Row(user_id=by_arm[1], value=2.0)]
    )
    rows = ab_test_stats(df).collect()
    assert {r["arm"] for r in rows} == {0, 1}
    for r in rows:
        assert r["n"] == 1
        assert r["var"] is None
        assert r["z"] is None


# ------------------------------------------------------- temporal id_col
def _renamed_events(spark):
    return spark.createDataFrame(
        [
            Row(uid=1, when_ts="2024-01-01 00:00:00", v=1.0, eid=10),
            Row(uid=1, when_ts="2024-01-01 00:30:00", v=2.0, eid=11),
            Row(uid=1, when_ts="2024-01-03 00:00:00", v=3.0, eid=12),
        ]
    ).select(
        "uid", F.col("when_ts").cast("timestamp").alias("when_ts"), "v", "eid"
    )


def test_rolling_time_window_custom_id_col(spark):
    out = rolling_time_window(
        _renamed_events(spark),
        key_col="uid",
        ts_col="when_ts",
        value_col="v",
        id_col="eid",
    ).collect()
    by_id = {r["event_id"]: r for r in out}
    assert by_id[11]["n_trailing"] == 2 and by_id[11]["sum_trailing"] == 3.0


def test_downsample_custom_id_col(spark):
    out = downsample_first_per_bucket(
        _renamed_events(spark),
        key_col="uid",
        ts_col="when_ts",
        bucket_seconds=3600,
        id_col="eid",
    ).collect()
    assert sorted(r["event_id"] for r in out) == [10, 12]


def test_event_gap_stats_custom_id_col(spark):
    out = event_gap_stats(
        _renamed_events(spark),
        key_col="uid",
        ts_col="when_ts",
        gap_threshold_s=86_400,
        id_col="eid",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 3
    assert r["max_gap_us"] == (47 * 3600 + 1800) * 1_000_000
    assert r["n_large_gaps"] == 1
