"""Observability (SURVEY.md §2.12 X4): metrics ride the job via
df.observe — zero extra passes — and the registry mirrors the reference's
metric surface without its always-increment-failure bug."""

from __future__ import annotations

import pytest
from pyspark.sql import Observation, Row
from pyspark.sql import functions as F

from breweries_etl_spark.plans.metrics import MetricsRegistry


def test_observation_rides_the_action(spark):
    df = spark.createDataFrame([Row(v=float(i)) for i in range(100)])
    obs = Observation("stage_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("v").alias("v_total"),
        F.count(F.when(F.col("v") > 90, 1)).alias("v_high"),
    )
    # one action materializes BOTH the data and the metrics
    assert observed.filter("v >= 0").count() == 100
    got = obs.get
    assert got["rows"] == 100
    assert got["v_total"] == pytest.approx(4950.0)
    assert got["v_high"] == 9


def test_registry_times_and_counts_failures_only_on_failure():
    reg = MetricsRegistry()
    with reg.time_operation("extract", "landing"):
        pass
    assert "landing_extract_seconds" in reg.durations
    assert reg.counters.get("landing_extract_failures") is None  # ref bug not replicated

    with pytest.raises(ValueError):
        with reg.time_operation("extract", "landing"):
            raise ValueError("boom")
    assert reg.counters["landing_extract_failures"] == 1


def test_registry_push_degrades_without_prometheus():
    reg = MetricsRegistry()
    reg.inc("x")
    assert reg.push(None) is False  # no gateway configured -> no-op
