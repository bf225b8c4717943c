"""SparkSession factory.

One place to encode the scale posture: AQE (runtime re-planning, skew-join
splitting, partition coalescing), UTC session timezone (oracle parity with
DuckDB), Arrow for any pandas exchange, and shuffle partitions sized to the
environment rather than Spark's default 200.

On a real cluster the same builder applies — only master/memory change; the
SQL-level configs here are cluster-safe defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "breweries_etl_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Progress bars write \r-frames to stdout; any harness that
        # captures/parses stdout (bench driver) must see clean lines.
        .config("spark.ui.showConsoleProgress", "false")
        # Files: keep split sizes sane for both 60k-row test parquet and
        # multi-GB production parquet.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Broadcast small dimension tables aggressively (region/nation/
        # supplier-class dims stay far under this at any SF we run).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
