"""Sink/source format coverage beyond parquet: ORC, CSV, JSON round-trips
through the same parameterized writer (K5's ``fmt``)."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.sinks.writers import write_table


def _frame(spark):
    return spark.createDataFrame(
        [Row(id="1", name="Alpha", score=1.5), Row(id="2", name="Beta", score=2.5)]
    )


def test_orc_roundtrip(spark, tmp_path):
    df = _frame(spark)
    out = str(tmp_path / "orc_out")
    write_table(df, out, fmt="orc")
    back = spark.read.orc(out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    assert dict(back.dtypes) == dict(df.dtypes)


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    df = _frame(spark)
    out = str(tmp_path / "csv_out")
    df.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema("id string, name string, score double").option(
        "header", "true"
    ).csv(out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_json_roundtrip(spark, tmp_path):
    df = _frame(spark)
    out = str(tmp_path / "json_out")
    write_table(df, out, fmt="json")
    back = spark.read.schema("id string, name string, score double").json(out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
