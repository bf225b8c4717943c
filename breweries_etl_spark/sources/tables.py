"""Parquet table loaders for the driver testdata and any medallion layer
(SURVEY.md §2.1 S4-S6).

S6 note: the reference hand-rolls partition discovery (glob
``base/location=*`` + per-dir read + concat, ref: U/helpers.py:420-493).
Spark's parquet reader does Hive-style partition discovery natively and
recovers partition columns, with partition *pruning* pushed into the scan
— the entire S6 code path collapses into ``spark.read.parquet(base)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (``{sf_dir}/{name}.parquet``)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table is written with TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default. Read nanos as long (legacy conf,
    runtime-settable) and rebuild a proper timestamp at microsecond
    precision — ``ts div 1000`` is exact integer arithmetic, so the value
    is identical on every executor and matches DuckDB's TIMESTAMP_NS
    truncated to micros."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {
        n: (load_events(spark, sf_dir) if n == "events" else load_table(spark, sf_dir, n))
        for n in (names or TESTDATA_TABLES)
    }


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so operators can be expressed in
    SQL when that is clearer (same Catalyst plan either way)."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def read_layer(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S5/S6 — read a medallion layer; partitioned layers (silver) get
    automatic partition discovery + pruning."""
    return spark.read.format(fmt).load(path)
