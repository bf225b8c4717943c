"""As-of join semantics: inclusive backward match, LEFT nulls, per-key
isolation, row-atomic payload."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.operators.asof import asof_join_backward


def _frames(spark):
    left = spark.createDataFrame(
        [Row(user_id=1, ts_us=100, event_id=10),
         Row(user_id=1, ts_us=200, event_id=11),
         Row(user_id=2, ts_us=100, event_id=20),
         Row(user_id=3, ts_us=100, event_id=30)],  # user 3 has no right rows
    )
    right = spark.createDataFrame(
        [Row(user_id=1, ts_us=50, value=1.0),
         Row(user_id=1, ts_us=150, value=2.0),
         Row(user_id=1, ts_us=250, value=3.0),   # after both left rows
         Row(user_id=2, ts_us=100, value=9.0)],  # exactly equal ts
    )
    return left, right


def test_backward_inclusive_match(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in asof_join_backward(
        left, right, by="user_id", on="ts_us",
        left_cols=["event_id"], right_cols=["value"]).collect()}
    assert out[10]["asof_value"] == 1.0 and out[10]["asof_ts_us"] == 50
    assert out[11]["asof_value"] == 2.0 and out[11]["asof_ts_us"] == 150
    # equal timestamps match (inclusive, like DuckDB ASOF and merge_asof)
    assert out[20]["asof_value"] == 9.0
    # LEFT semantics: no match -> nulls
    assert out[30]["asof_value"] is None and out[30]["asof_ts_us"] is None


def test_no_cross_key_leakage(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in asof_join_backward(
        left, right, by="user_id", on="ts_us",
        left_cols=["event_id"], right_cols=["value"]).collect()}
    # user 2's match must come from user 2's rows only
    assert out[20]["asof_ts_us"] == 100


def test_row_atomic_payload(spark):
    """A NULL in one right column must not borrow from an older row."""
    left = spark.createDataFrame([Row(user_id=1, ts_us=300, event_id=1)])
    right = spark.createDataFrame(
        [Row(user_id=1, ts_us=100, value=7.0, tag="old"),
         Row(user_id=1, ts_us=200, value=None, tag="new")],
        "user_id long, ts_us long, value double, tag string",
    )
    out = asof_join_backward(
        left, right, by="user_id", on="ts_us",
        left_cols=["event_id"], right_cols=["value", "tag"]).first()
    assert out["asof_tag"] == "new"
    assert out["asof_value"] is None  # NOT 7.0 from the older row
