"""End-to-end medallion pipeline over landing JSON fixtures
(SURVEY.md §3): landing → bronze → silver(+quarantine) → gold, asserting
layer contents — the e2e coverage the reference's README claims but its
suite doesn't have.
"""

from __future__ import annotations

import json
import os

import pytest

from breweries_etl_spark.config import MedallionPaths
from breweries_etl_spark.plans.pipeline import run_pipeline
from breweries_etl_spark.sinks.writers import prepare_landing_directory, save_json_page
from breweries_etl_spark.sources.brewery_api import fetch_all_pages, pages_to_dataframe

PAGE1 = [
    {"id": "b1", "name": "Alpha", "brewery_type": " Micro ", "state": "wy",
     "city": "laramie", "country": "united states", "website_url": "alpha.com"},
    {"id": "b2", "name": "Beta", "brewery_type": "taproom", "state": "on",
     "city": "toronto", "country": "canada", "website_url": "https://beta.io"},
    {"id": None, "name": "NoId", "brewery_type": "nano", "state": "wy",
     "city": "cody", "country": "united states", "website_url": ""},
]


@pytest.fixture()
def medallion(tmp_path, spark):
    paths = MedallionPaths(str(tmp_path))
    prepare_landing_directory(paths.landing)
    save_json_page(PAGE1, os.path.join(paths.landing, "breweries_page1.json"))
    return paths


def test_pipeline_layers(spark, medallion):
    run_pipeline(spark, medallion, retries=1)

    bronze = spark.read.parquet(medallion.bronze)
    assert bronze.count() == 3
    assert dict(bronze.dtypes)["ingestion_timestamp"] == "timestamp"

    silver = spark.read.parquet(medallion.silver)
    rows = {r["id"]: r.asDict() for r in silver.collect()}
    assert set(rows) == {"b1", "b2"}
    assert rows["b1"]["brewery_type"] == "micro"
    assert rows["b1"]["location"] == "UNITED STATES"
    assert rows["b1"]["website_url"] == "http://alpha.com"
    assert rows["b2"]["brewery_type"] == "other"
    assert rows["b2"]["website_url"] == "https://beta.io"
    # silver is hive-partitioned by location
    assert any(d.startswith("location=") for d in os.listdir(medallion.silver))

    quarantine = spark.read.parquet(medallion.quarantine)
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["name"] == "NoId"
    assert q[0]["quarantine_reason"] == "missing_key_values"

    by_type = spark.read.parquet(medallion.gold_table("by_type_location"))
    got = {(r["brewery_type"], r["location"]): r["brewery_count"] for r in by_type.collect()}
    assert got == {("micro", "UNITED STATES"): 1, ("other", "CANADA"): 1}

    by_loc = spark.read.parquet(medallion.gold_table("by_location"))
    assert {r["location"]: r["brewery_count"] for r in by_loc.collect()} == {
        "UNITED STATES": 1, "CANADA": 1}


def test_quarantine_appends_across_runs(spark, medallion):
    run_pipeline(spark, medallion, retries=1)
    run_pipeline(spark, medallion, retries=1)
    # overwrite layers stay stable; quarantine appends (K4 semantics)
    assert spark.read.parquet(medallion.silver).count() == 2
    assert spark.read.parquet(medallion.quarantine).count() == 2


def test_paginated_source_stop_condition(spark):
    """S1: stop when a page returns < per_page rows (ref stop condition)."""
    pages_served = {1: [{"id": str(i)} for i in range(5)],
                    2: [{"id": "last"}]}

    def fetcher(page, per_page):
        return pages_served.get(page, [])

    pages = fetch_all_pages(fetcher, per_page=5, throttle_s=0)
    assert [len(p) for p in pages] == [5, 1]
    df = pages_to_dataframe(spark, pages)
    assert df.count() == 6
    assert df.schema["id"].dataType.typeName() == "string"


def test_landing_read_quarantines_corrupt_json(spark, tmp_path):
    """A malformed landing page must quarantine with its raw payload,
    not fail the scan or silently null out (S3 robustness)."""
    import json as _json

    from breweries_etl_spark.sources.json_source import (
        read_landing_json_with_quarantine,
    )

    good = [
        {"id": "1", "brewery_type": "micro", "state": "s", "city": "c",
         "country": "x", "name": "a"},
        {"id": "2", "brewery_type": "nano", "state": "s", "city": "c",
         "country": "x", "name": "b"},
    ]
    src = tmp_path / "landing"
    src.mkdir()
    (src / "page1.json").write_text(_json.dumps(good), encoding="utf-8")
    (src / "page2.json").write_text('[{"id": "3", "brewery_type": ', encoding="utf-8")

    valid, corrupt = read_landing_json_with_quarantine(spark, str(src))
    ids = sorted(r["id"] for r in valid.select("id").collect())
    assert ids == ["1", "2"]
    bad = corrupt.collect()
    assert len(bad) == 1
    assert "brewery_type" in bad[0]["raw_payload"]
