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


def test_run_pipeline_drains_per_stage_record_counts(spark, tmp_path):
    """Reference parity for records_processed_total (ref: U/metrics.py:44-49):
    every stage's row count lands in the registry, measured by an
    Observation riding the stage's own write action — no extra passes."""
    import json
    import os

    from breweries_etl_spark.config import MedallionPaths
    from breweries_etl_spark.plans.pipeline import run_pipeline
    from breweries_etl_spark.sinks.writers import (
        prepare_landing_directory,
        save_json_page,
    )

    page = [
        {"id": "b1", "name": "Alpha", "brewery_type": "micro", "state": "wy",
         "city": "laramie", "country": "united states", "website_url": "a.com"},
        {"id": "b2", "name": "Beta", "brewery_type": "nano", "state": "on",
         "city": "toronto", "country": "canada", "website_url": "b.io"},
        {"id": None, "name": "NoId", "brewery_type": "nano", "state": "wy",
         "city": "cody", "country": "united states", "website_url": ""},
    ]
    paths = MedallionPaths(str(tmp_path))
    prepare_landing_directory(paths.landing)
    save_json_page(page, os.path.join(paths.landing, "p1.json"))

    metrics = run_pipeline(spark, paths, retries=1)

    assert metrics.counters["bronze_records_processed_total"] == 3
    assert metrics.counters["silver_records_processed_total"] == 2
    assert metrics.counters["quarantine_records_processed_total"] == 1
    assert metrics.counters["gold_by_type_location_records_processed_total"] == 2
    assert metrics.counters["gold_by_location_records_processed_total"] == 2


def test_exposition_prometheus_text_format():
    """The exposition surface the Grafana dashboard JSON
    (monitoring/grafana/dashboards/) scrapes: HELP/TYPE headers, prefixed
    sanitized names, counter vs gauge typing."""
    from breweries_etl_spark.plans.metrics import MetricsRegistry

    reg = MetricsRegistry()
    reg.inc("silver_records_processed_total", 1314)
    reg.set_gauge("bronze bytes written", 2048.5)
    reg.durations["silver_bronze_to_silver_seconds"] = 1.25
    text = reg.exposition()
    assert "# HELP brewery_etl_silver_records_processed_total" in text
    assert "# TYPE brewery_etl_silver_records_processed_total counter" in text
    assert "brewery_etl_silver_records_processed_total 1314.0" in text
    # names sanitized to the prometheus charset
    assert "# TYPE brewery_etl_bronze_bytes_written gauge" in text
    assert "brewery_etl_bronze_bytes_written 2048.5" in text
    assert "# TYPE brewery_etl_silver_bronze_to_silver_seconds gauge" in text
    assert text.endswith("\n")


def test_exposition_names_cover_dashboard_targets():
    """Every concrete metric the checked-in dashboard queries must be a
    name the pipeline actually emits (regression guard for renames)."""
    import json
    import re

    with open("monitoring/grafana/dashboards/spark_pipeline_dashboard.json") as f:
        dash = json.load(f)
    targets = [
        t["expr"]
        for p in dash["panels"]
        for t in p.get("targets", [])
    ]
    concrete = set()
    for expr in targets:
        concrete.update(re.findall(r"brewery_etl_[a-z0-9_]+", expr))
    emitted = {
        "brewery_etl_bronze_records_processed_total",
        "brewery_etl_bronze_landing_to_bronze_seconds",
        "brewery_etl_bronze_landing_to_bronze_failures",
        "brewery_etl_silver_records_processed_total",
        "brewery_etl_silver_bronze_to_silver_seconds",
        "brewery_etl_quarantine_records_processed_total",
        "brewery_etl_gold_by_type_location_records_processed_total",
        "brewery_etl_gold_by_location_records_processed_total",
        "brewery_etl_gold_silver_to_gold_seconds",
    }
    assert concrete <= emitted, concrete - emitted
