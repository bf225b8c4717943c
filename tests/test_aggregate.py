"""Gold aggregations against hand-computed frames (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.operators.aggregate import (
    create_aggregation,
    gold_aggregations,
    row_count,
    value_counts,
)

SILVER = [
    Row(brewery_type="micro", location="USA", state="WY", city="LARAMIE"),
    Row(brewery_type="micro", location="USA", state="WY", city="LARAMIE"),
    Row(brewery_type="nano", location="USA", state="WY", city="LARAMIE"),
    Row(brewery_type="micro", location="CANADA", state="ON", city="TORONTO"),
]


def test_create_aggregation(spark):
    df = spark.createDataFrame(SILVER)
    out = create_aggregation(df, ["brewery_type", "location", "state", "city"], "brewery_count")
    got = {(r["brewery_type"], r["location"]): r["brewery_count"] for r in out.collect()}
    assert got[("micro", "USA")] == 2
    assert got[("nano", "USA")] == 1
    assert got[("micro", "CANADA")] == 1


def test_gold_by_location_is_rollup_of_by_type(spark):
    df = spark.createDataFrame(SILVER)
    gold = gold_aggregations(df)
    by_loc = {r["location"]: r["brewery_count"] for r in gold["by_location"].collect()}
    assert by_loc == {"USA": 3, "CANADA": 1}


def test_value_counts_desc(spark):
    df = spark.createDataFrame([Row(t=x) for x in "aabbbc"])
    rows = value_counts(df, "t").collect()
    assert [(r["t"], r["count"]) for r in rows] == [("b", 3), ("a", 2), ("c", 1)]


def test_row_count(spark):
    df = spark.createDataFrame([Row(a=i) for i in range(7)])
    assert row_count(df).first()["n_rows"] == 7


def test_geometric_mean_udaf_matches_closed_form(spark):
    import math

    from breweries_etl_spark.operators.aggregate import geometric_mean_by

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 5.0), ("b", 0.0), ("b", -3.0)],
        "k string, v double",
    )
    out = {r["k"]: r for r in geometric_mean_by(df, "k", "v").collect()}
    # group a: sqrt(2*8) = 4 exactly; group b: non-positives filtered -> 5
    assert out["a"]["geo_mean"] == 4.0
    assert out["b"]["geo_mean"] == 5.0
    assert out["a"]["log_mean"] == round(
        (math.log(2.0) + math.log(8.0)) / 2, 6
    )
