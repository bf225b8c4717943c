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


def test_contract_violations_counts(spark):
    from breweries_etl_spark.operators.quality import contract_violations
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, 10, "O"),
            (1, 20, "F"),        # duplicate pk
            (None, 30, "O"),     # null pk
            (4, None, "X"),      # null fk + bad status
            (5, 99, "O"),        # orphan fk
        ],
        "pk long, fk long, status string",
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    out = {
        (r["constraint"], r["column"]): r["n_violations"]
        for r in contract_violations(
            df,
            not_null=["pk", "fk"],
            unique=["pk"],
            accepted_values={"status": ["O", "F"]},
            references=[("fk", dim, "k")],
        ).collect()
    }
    assert out == {
        ("not_null", "pk"): 1,
        ("not_null", "fk"): 1,
        ("unique", "pk"): 1,       # one extra copy of pk=1
        ("accepted_values", "status"): 1,
        ("references", "fk"): 1,   # fk=99 orphan (nulls skipped)
    }


def test_contract_violations_clean_table_keeps_zero_rows(spark):
    from breweries_etl_spark.operators.quality import contract_violations

    df = spark.createDataFrame([(1, "O"), (2, "F")], "pk long, status string")
    rows = contract_violations(
        df, not_null=["pk"], unique=["pk"], accepted_values={"status": ["O", "F"]}
    ).collect()
    assert len(rows) == 3 and all(r["n_violations"] == 0 for r in rows)


def test_plan_backfill_missing_days():
    from breweries_etl_spark.plans.pipeline import plan_backfill

    have = ["2024-01-01", "2024-01-03"]
    assert plan_backfill(have, "2024-01-01", "2024-01-05") == [
        "2024-01-02", "2024-01-04", "2024-01-05",
    ]
    assert plan_backfill(have, "2024-01-01", "2024-01-05", max_partitions=2) == [
        "2024-01-02", "2024-01-04",
    ]
    import pytest

    with pytest.raises(ValueError):
        plan_backfill([], "2024-02-01", "2024-01-01")


def test_schema_diff_classifies_changes():
    from pyspark.sql import types as T

    from breweries_etl_spark.operators.quality import schema_diff

    old = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.IntegerType(), True),
        ]
    )
    new = T.StructType(
        [
            T.StructField("a", T.LongType(), True),      # nullability relaxed
            T.StructField("b", T.DoubleType(), True),    # retyped
            T.StructField("d", T.StringType(), True),    # added; c removed
        ]
    )
    got = {(d["change"], d["column"]): d for d in schema_diff(old, new)}
    assert set(got) == {
        ("removed", "c"), ("added", "d"), ("retyped", "b"), ("nullability", "a"),
    }
    assert got[("retyped", "b")]["old"] == "string"
    assert got[("retyped", "b")]["new"] == "double"
    assert schema_diff(old, old) == []


def test_k_anonymity_flags_small_classes(spark):
    from breweries_etl_spark.operators.quality import k_anonymity_check

    rows = [("us", "a")] * 6 + [("us", "b")] * 2 + [("de", "a")]
    df = spark.createDataFrame(rows, "nation string, seg string")
    r = k_anonymity_check(df, ["nation", "seg"], k=5).collect()[0]
    assert r["n_classes"] == 3
    assert r["n_unsafe_classes"] == 2   # (us,b)=2 and (de,a)=1
    assert r["n_rows_at_risk"] == 3
    assert r["min_class_size"] == 1
