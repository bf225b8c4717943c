"""AQE skew-join handling: the runtime re-plan splits a hot partition —
the mechanism the session config (adaptive.skewJoin) relies on at scale.
Also documents the limitation: AQE skips the split when it would break a
required downstream distribution (e.g. a groupBy on the join key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    saved = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark):
    # ~90% of left rows share key 0 → one hot shuffle partition
    left = spark.range(300000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left.join(right, "k")


def test_aqe_splits_skewed_partition(spark, skew_confs):
    j = _skewed_join(spark)
    rows = j.collect()
    assert len(rows) == 300000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan  # the hot partition was split at runtime


def test_aqe_skips_split_when_distribution_needed(spark, skew_confs):
    """Downstream groupBy on the join key pins the distribution — AQE
    must NOT split (splitting would require an extra shuffle)."""
    j = _skewed_join(spark).groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan
