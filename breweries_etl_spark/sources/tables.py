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


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to session-zoned TIMESTAMP regardless of
    how the parquet writer encoded it. Generations of the testdata have
    shipped it as TIMESTAMP(NANOS) (read as long under the legacy conf —
    rebuilt via exact integer ``div 1000``), as TIMESTAMP_NTZ (cast is a
    no-op re-tag under the UTC session timezone), and as plain TIMESTAMP.
    All three converge on the same microsecond instants DuckDB sees, so
    oracle parity holds across testdata regenerations."""
    dt = dict(df.dtypes).get("ts")
    if dt in ("bigint", "long"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table with ``ts`` normalized to TIMESTAMP (see
    :func:`normalize_event_ts`). The legacy nanos conf is set pre-read so
    nanos-encoded generations load as long instead of erroring."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(load_table(spark, sf_dir, "events"))


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
