"""Upsert/SCD2, salted aggregation equivalence, custom Python DataSource,
stateful streaming."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from breweries_etl_spark.operators.merge import (
    merge_upsert,
    salted_group_count,
    scd2_close_and_append,
)
from breweries_etl_spark.sources.brewery_datasource import BreweryDataSource
from breweries_etl_spark.sources.tables import load_events
from breweries_etl_spark.streaming.stateful import run_user_profiles_once


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    updates = spark.createDataFrame([Row(k=2, v="B2"), Row(k=4, v="D")])
    got = {r["k"]: r["v"] for r in merge_upsert(target, updates, "k").collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "D"}


def test_scd2_versions(spark):
    current = spark.createDataFrame(
        [Row(k=1, v="a", version=1, is_current=True),
         Row(k=2, v="b", version=2, is_current=True)]
    )
    updates = spark.createDataFrame([Row(k=2, v="b3"), Row(k=9, v="new")])
    out = scd2_close_and_append(current, updates, "k").collect()
    rows = {(r["k"], r["version"]): r for r in out}
    assert rows[(1, 1)]["is_current"] is True          # untouched
    assert rows[(2, 2)]["is_current"] is False         # closed
    assert rows[(2, 3)]["is_current"] is True and rows[(2, 3)]["v"] == "b3"
    assert rows[(9, 1)]["is_current"] is True          # brand new at v1


def test_salted_equals_plain_groupby(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    plain = {r["event_type"]: r["count"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {r["event_type"]: r["count"] for r in
              salted_group_count(ev, "event_type").collect()}
    assert plain == salted


def test_custom_datasource_fixture_pages(spark, tmp_path):
    pages = [
        [{"id": "1", "name": "A", "brewery_type": "micro", "country": "X"},
         {"id": "2", "name": "B", "brewery_type": "nano", "country": "Y"}],
        [{"id": "3", "name": "C", "brewery_type": "micro", "country": "X"}],
    ]
    fixture = tmp_path / "pages.json"
    fixture.write_text(json.dumps(pages))
    try:
        spark.dataSource.register(BreweryDataSource)
    except Exception:
        pass
    df = spark.read.format("openbrewerydb").option("fixture_json", str(fixture)).load()
    assert df.count() == 3
    # partition-per-page: the scan parallelizes across pages
    assert df.rdd.getNumPartitions() == 2
    assert dict(df.dtypes)["longitude"] == "double"  # declared schema applies
    assert {r["id"] for r in df.select("id").collect()} == {"1", "2", "3"}


def test_stateful_profiles_match_batch_aggregate(spark):
    sf_dir = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in
           run_user_profiles_once(spark, sf_dir, "t_profiles").collect()}
    ev = load_events(spark, sf_dir)
    expect = {r["user_id"]: r for r in
              ev.groupBy("user_id").agg(
                  F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 6).alias("total_value"),
                  F.max(F.unix_micros("ts")).alias("last_ts_us")).collect()}
    assert set(got) == set(expect)
    for uid in got:
        assert got[uid]["n_events"] == expect[uid]["n_events"]
        assert got[uid]["last_ts_us"] == expect[uid]["last_ts_us"]
        assert abs(got[uid]["total_value"] - expect[uid]["total_value"]) < 1e-4


def _run_latest_sink(spark, src, tbl):
    from breweries_etl_spark.streaming.merge_sink import (
        read_latest_snapshot,
        streaming_latest_merge_sink,
    )

    schema = "k long, seq long, payload string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = streaming_latest_merge_sink(stream, tbl, "k", ["seq"], query_name="t_latest")
    q.awaitTermination()
    return read_latest_snapshot(spark, tbl)


def test_streaming_merge_sink_latest_wins_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    rows = [
        Row(k=1, seq=1, payload="old"),
        Row(k=1, seq=5, payload="new"),
        Row(k=2, seq=3, payload="only"),
        Row(k=3, seq=2, payload="a"),
        Row(k=3, seq=9, payload="b"),
        Row(k=3, seq=4, payload="c"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, payload string")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1, arbitrary order
    df.repartition(3).write.parquet(src)
    got = {r["k"]: r for r in _run_latest_sink(spark, src, tbl).collect()}
    assert got[1]["payload"] == "new" and got[1]["seq"] == 5
    assert got[2]["payload"] == "only"
    assert got[3]["payload"] == "b" and got[3]["seq"] == 9


def test_streaming_merge_sink_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    rows = [Row(k=1, seq=1, payload="x"), Row(k=2, seq=2, payload="y")]
    spark.createDataFrame(rows, "k long, seq long, payload string").repartition(
        2
    ).write.parquet(src)
    first = sorted(map(tuple, _run_latest_sink(spark, src, tbl).collect()))
    # fresh run over the same source and SAME table dir (temp checkpoint ->
    # full reprocess): snapshot must not duplicate or drift
    again = sorted(map(tuple, _run_latest_sink(spark, src, tbl).collect()))
    assert first == again


def test_streaming_datasource_pages_as_microbatches(spark, tmp_path):
    """The streaming face of the REST source: one page per micro-batch,
    offset = committed page count, exhaustion reported as no-new-data so
    processAllAvailable terminates."""
    pages = [
        [{"id": "1", "name": "A", "brewery_type": "micro", "country": "X"}],
        [{"id": "2", "name": "B", "brewery_type": "nano", "country": "Y"}],
        [{"id": "3", "name": "C", "brewery_type": "micro", "country": "X"}],
    ]
    fixture = tmp_path / "stream_pages.json"
    fixture.write_text(json.dumps(pages))
    try:
        spark.dataSource.register(BreweryDataSource)
    except Exception:
        pass
    stream = (
        spark.readStream.format("openbrewerydb")
        .option("fixture_json", str(fixture))
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("t_brewery_stream")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT id FROM t_brewery_stream").collect()
        assert {r["id"] for r in got} == {"1", "2", "3"}
        # one page per micro-batch: at least 3 batches committed
        assert q.lastProgress["batchId"] >= 2
    finally:
        q.stop()


def test_streaming_datasource_replay_between_offsets(tmp_path):
    """Failure replay must re-produce EXACTLY the pages in (start, end]."""
    from breweries_etl_spark.sources.brewery_datasource import (
        BreweryStreamReader,
        _SchemaShim,
    )

    pages = [
        [{"id": "1"}], [{"id": "2"}], [{"id": "3"}],
    ]
    fixture = tmp_path / "pages.json"
    fixture.write_text(json.dumps(pages))
    reader = BreweryStreamReader(
        _SchemaShim(["id"]), {"fixture_json": str(fixture)}
    )
    assert reader.initialOffset() == {"page": 0}
    rows, off = reader.read({"page": 0})
    assert list(rows) == [("1",)] and off == {"page": 1}
    replay = list(reader.readBetweenOffsets({"page": 1}, {"page": 3}))
    assert replay == [("2",), ("3",)]
    # exhausted: same offset back, no rows
    rows, off = reader.read({"page": 3})
    assert list(rows) == [] and off == {"page": 3}
