"""Quarantine split, schema validation, null accounting (SURVEY.md §2.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from breweries_etl_spark.operators.quality import (
    count_duplicate_ids,
    null_counts,
    split_invalid_records,
    validate_schema,
)

ROWS = [
    Row(id="1", brewery_type="micro", state="A", city="B", country="C", name="ok"),
    Row(id=None, brewery_type="micro", state="A", city="B", country="C", name="no_id"),
    Row(id="3", brewery_type=None, state="A", city="B", country=None, name="two_nulls"),
    Row(id="4", brewery_type="nano", state="A", city="B", country="C", name="ok2"),
]
SCHEMA = "id string, brewery_type string, state string, city string, country string, name string"


def test_split_counts_and_membership(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    valid, quarantined = split_invalid_records(df)
    assert {r["name"] for r in valid.collect()} == {"ok", "ok2"}
    assert {r["name"] for r in quarantined.collect()} == {"no_id", "two_nulls"}


def test_quarantine_annotations(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    _, quarantined = split_invalid_records(df)
    row = quarantined.first()
    assert row["quarantine_reason"] == "missing_key_values"
    assert "T" in row["quarantine_timestamp"]  # ISO string, not timestamp type
    assert dict(quarantined.dtypes)["quarantine_timestamp"] == "string"


def test_validate_schema_raises_with_missing_list(spark):
    df = spark.createDataFrame([Row(id="1", state="A")])
    with pytest.raises(ValueError) as exc:
        validate_schema(df)
    assert "brewery_type" in str(exc.value)
    assert "city" in str(exc.value)


def test_null_counts_single_pass(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = null_counts(df).first()
    assert out["id_nulls"] == 1
    assert out["brewery_type_nulls"] == 1
    assert out["country_nulls"] == 1
    assert out["state_nulls"] == 0


def test_duplicate_count_second_plus_occurrences(spark):
    df = spark.createDataFrame([Row(id=x) for x in ["a", "a", "a", "b", "c", "c"]])
    assert count_duplicate_ids(df, "id").first()["duplicate_count"] == 3
    df2 = spark.createDataFrame([Row(id="a"), Row(id="b")])
    assert count_duplicate_ids(df2, "id").first()["duplicate_count"] == 0
