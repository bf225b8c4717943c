"""Output-value tests for the silver transform chain (SURVEY.md §2.4).

The reference's suite mocks every collaborator and asserts only call
shapes (SURVEY.md §5); these tests assert actual transform outputs —
recode branch-exactness, URL normalization shapes, null propagation.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from breweries_etl_spark.operators.standardize import (
    add_processing_metadata,
    brewery_type_expr,
    convert_string_columns,
    silver_transform,
    standardize_location_fields,
    website_url_expr,
)


def _recode(spark, value):
    df = spark.createDataFrame([Row(x=value)], "x string")
    return df.select(brewery_type_expr(F.col("x")).alias("y")).first()["y"]


def test_brewery_type_canonical_identity(spark):
    for t in ["micro", "nano", "regional", "brewpub", "large",
              "planning", "bar", "contract", "proprietor", "closed"]:
        assert _recode(spark, t) == t


def test_brewery_type_case_and_whitespace(spark):
    assert _recode(spark, "  MICRO ") == "micro"
    assert _recode(spark, "BrewPub") == "brewpub"


def test_brewery_type_miss_and_null(spark):
    assert _recode(spark, "taproom") == "other"
    assert _recode(spark, "") == "other"
    assert _recode(spark, None) == "unknown"


def _url(spark, value):
    df = spark.createDataFrame([Row(x=value)], "x string")
    return df.select(website_url_expr(F.col("x")).alias("y")).first()["y"]


def test_url_normalization(spark):
    assert _url(spark, None) is None
    assert _url(spark, "") is None
    assert _url(spark, "   ") is None
    assert _url(spark, " example.com ") == "http://example.com"
    assert _url(spark, "http://a.io") == "http://a.io"
    assert _url(spark, "https://a.io") == "https://a.io"
    # scheme must be a prefix — not mid-string
    assert _url(spark, "see https://a.io") == "http://see https://a.io"


def test_location_fields_upper_and_derived(spark):
    df = spark.createDataFrame(
        [Row(state="wy", city="laramie", country="united states")]
    )
    out = standardize_location_fields(df).first()
    assert out["state"] == "WY"
    assert out["city"] == "LARAMIE"
    assert out["country"] == "UNITED STATES"
    assert out["location"] == "UNITED STATES"


def test_location_null_propagates(spark):
    df = spark.createDataFrame([Row(state=None, city="x", country=None)],
                               "state string, city string, country string")
    out = standardize_location_fields(df).first()
    assert out["state"] is None
    assert out["location"] is None


def test_convert_string_columns_keeps_null(spark):
    df = spark.createDataFrame([Row(id=1, brewery_type=None, state="a", city="b", country="c")],
                               "id long, brewery_type string, state string, city string, country string")
    out = convert_string_columns(df).first()
    assert out["id"] == "1"
    assert out["brewery_type"] is None  # no 'nan' stringification


def test_processing_metadata(spark):
    df = spark.createDataFrame([Row(a=1)])
    out = add_processing_metadata(df).first()
    assert out["etl_version"] == "1.0"
    # ISO-8601 string with microseconds, like datetime.isoformat()
    assert "T" in out["processed_at"] and len(out["processed_at"]) == 26


def test_silver_transform_end_to_end(spark):
    df = spark.createDataFrame(
        [Row(id="1", name="B1", brewery_type=" Micro ", state="wy",
             city="laramie", country="usa", website_url="b1.com")]
    )
    out = silver_transform(df).first()
    assert out["brewery_type"] == "micro"
    assert out["location"] == "USA"
    assert out["website_url"] == "http://b1.com"
    assert out["etl_version"] == "1.0"
