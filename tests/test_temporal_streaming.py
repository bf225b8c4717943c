"""Temporal operators + streaming twin equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from breweries_etl_spark.operators.temporal import sessionize, sliding_counts, tumbling_counts
from breweries_etl_spark.sources.tables import load_events
from breweries_etl_spark.streaming.events import run_tumbling_once


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_tumbling_counts_buckets(spark):
    df = spark.createDataFrame(
        [Row(event_id=1, ts=dt.datetime(2024, 1, 1, 0, 10), event_type="a", value=1.0),
         Row(event_id=2, ts=dt.datetime(2024, 1, 1, 0, 50), event_type="a", value=2.0),
         Row(event_id=3, ts=dt.datetime(2024, 1, 1, 1, 5), event_type="a", value=4.0)]
    )
    got = {r["window_start"]: (r["n_events"], r["total_value"])
           for r in tumbling_counts(df).collect()}
    h0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert got[h0] == (2, 3.0)
    assert got[h0 + 3600] == (1, 4.0)


def test_sliding_each_event_in_four_windows(spark):
    df = spark.createDataFrame(
        [Row(event_id=1, ts=dt.datetime(2024, 1, 1, 0, 31), event_type="a", value=1.0)]
    )
    rows = sliding_counts(df).collect()
    assert len(rows) == 4
    starts = sorted(r["window_start"] for r in rows)
    assert starts[3] - starts[0] == 3 * 900


def test_sessionize_gap_split(spark):
    df = spark.createDataFrame(
        [Row(event_id=1, ts=_ts(0), user_id=7, value=1.0),
         Row(event_id=2, ts=_ts(10), user_id=7, value=1.0),   # same session
         Row(event_id=3, ts=_ts(50), user_id=7, value=1.0),   # 40min gap -> new
         Row(event_id=4, ts=_ts(5), user_id=8, value=1.0)]    # other user
    )
    got = {(r["user_id"], r["session_id"]): r["n_events"] for r in sessionize(df).collect()}
    assert got == {(7, 1): 2, (7, 2): 1, (8, 1): 1}


def test_streaming_equals_batch(spark):
    sf_dir = "/root/testdata/sf0.001"
    batch = tumbling_counts(load_events(spark, sf_dir))
    stream = run_tumbling_once(spark, sf_dir, query_name="t_stream_eq")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s and len(b) > 0


def test_streaming_sliding_equals_batch(spark):
    from breweries_etl_spark.streaming.events import (
        stream_events,
        streaming_sliding_counts,
    )

    sf_dir = "/root/testdata/sf0.001"
    agg = streaming_sliding_counts(stream_events(spark, sf_dir))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("t_slide_eq").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    s = {tuple(r) for r in spark.table("t_slide_eq").collect()}
    b = {tuple(r) for r in sliding_counts(load_events(spark, sf_dir)).collect()}
    assert s == b and len(b) > 0


def test_streaming_session_window_equals_batch(spark):
    from breweries_etl_spark.operators.temporal import session_window_agg
    from breweries_etl_spark.streaming.events import run_session_window_once

    sf_dir = "/root/testdata/sf0.001"
    s = {
        tuple(r)
        for r in run_session_window_once(spark, sf_dir, query_name="t_sess_eq").collect()
    }
    b = {tuple(r) for r in session_window_agg(load_events(spark, sf_dir)).collect()}
    assert s == b and len(b) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids replayed in a later micro-batch are dropped
    while state stays watermark-bounded."""
    import datetime as ddt
    import glob as g
    import os
    import shutil
    import time as t

    from pyspark.sql import types as T

    from breweries_etl_spark.streaming.events import streaming_dedup

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    t0 = ddt.datetime(2024, 1, 1, 0, 0)

    def write_file(name, rows):
        tmp = str(tmp_path / f"dtmp_{name}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.copy(g.glob(f"{tmp}/part-*.parquet")[0], f"{src}/{name}.parquet")

    write_file("b1", [(1, t0, 1.0), (2, t0 + ddt.timedelta(minutes=5), 2.0)])
    t.sleep(1.1)
    # replay of event 1 (at-least-once delivery) + a fresh event
    write_file("b2", [(1, t0, 1.0), (3, t0 + ddt.timedelta(minutes=10), 3.0)])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (streaming_dedup(stream).writeStream.outputMode("append")
         .format("memory").queryName("t_sdedup").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("t_sdedup").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]  # replay dropped


def test_foreach_batch_sink_idempotent_layout(spark, tmp_path):
    from breweries_etl_spark.streaming.events import (
        stream_events,
        write_stream_foreach_batch,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = str(tmp_path / "sink")
    q = write_stream_foreach_batch(stream_events(spark, sf_dir), out, "t_feb")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    assert written.count() == load_events(spark, sf_dir).count()
    # per-epoch directory layout (idempotent overwrite target)
    import os
    assert any(d.startswith("epoch=") for d in os.listdir(out))


def test_stream_stream_join_equals_batch_range_join(spark):
    """The streaming click→purchase attribution must equal the batch
    range join on the same static events data (inner interval joins
    emit every match once the stream drains)."""
    from pyspark.sql import functions as F

    from breweries_etl_spark.sources.tables import load_events
    from breweries_etl_spark.streaming.events import run_click_attribution_once

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r["click_id"], r["purchase_id"], r["gap_seconds"])
        for r in run_click_attribution_once(
            spark, sf_dir, query_name="attr_test"
        ).collect()
    }
    ev = load_events(spark, sf_dir)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    batch = {
        (r["click_id"], r["purchase_id"], r["gap"])
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "click_id",
            "purchase_id",
            (F.unix_timestamp("pts") - F.unix_timestamp("cts")).alias("gap"),
        )
        .collect()
    }
    assert got == batch and len(got) > 0


def _ev(spark, rows):
    # (event_id, seconds-offset, user_id, event_type)
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
                user_id=u,
                event_type=t,
            )
            for i, s, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_scd2_history_runs_and_versions(spark):
    from breweries_etl_spark.operators.temporal import scd2_history

    df = _ev(
        spark,
        [
            (1, 0, 1, "view"),
            (2, 10, 1, "view"),     # same state: no new version
            (3, 20, 1, "click"),    # v2
            (4, 30, 1, "view"),     # v3 (back to view = NEW run)
            (5, 0, 2, "purchase"),  # other user, v1
        ],
    )
    rows = sorted(
        scd2_history(df).collect(), key=lambda r: (r["user_id"], r["version"])
    )
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [r["state"] for r in u1] == ["view", "click", "view"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    assert [r["is_current"] for r in u1] == [False, False, True]
    # validity chain: each valid_to = next valid_from
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert [r["version"] for r in rows if r["user_id"] == 2] == [1]


def test_interval_coverage_merges_overlaps(spark):
    from breweries_etl_spark.operators.temporal import interval_coverage

    # 10s intervals: events at 0s and 5s overlap (one island, 15s),
    # event at 100s is its own island (10s)
    df = _ev(spark, [(1, 0, 1, "a"), (2, 5, 1, "a"), (3, 100, 1, "a")])
    row = interval_coverage(df, duration_us=10_000_000).collect()[0]
    assert row["n_intervals"] == 3
    assert row["n_islands"] == 2
    assert row["covered_us"] == 25_000_000


def test_interval_coverage_touching_intervals_merge(spark):
    from breweries_etl_spark.operators.temporal import interval_coverage

    # [0,10) and [10,20): touching (s == prev max e) merges — s > e breaks
    df = _ev(spark, [(1, 0, 1, "a"), (2, 10, 1, "a")])
    row = interval_coverage(df, duration_us=10_000_000).collect()[0]
    assert row["n_islands"] == 1 and row["covered_us"] == 20_000_000


def test_transition_counts(spark):
    from breweries_etl_spark.operators.temporal import transition_counts

    df = _ev(
        spark,
        [
            (1, 0, 1, "view"),
            (2, 1, 1, "click"),
            (3, 2, 1, "view"),
            (4, 0, 2, "view"),
            (5, 1, 2, "click"),
        ],
    )
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["n_users"])
        for r in transition_counts(df).collect()
    }
    assert got == {("view", "click"): (2, 2), ("click", "view"): (1, 1)}


def test_transform_with_state_profiles_match_batch(spark, sf_dir):
    """transformWithStateInPandas twin agrees with the batch rollup
    (skipped where the protobuf runtime is absent — the API's state
    protocol needs it)."""
    import pytest
    from pyspark.sql import functions as F

    from breweries_etl_spark.streaming.stateful import (
        run_user_profiles_tws_once,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf not installed in this container")
    out = run_user_profiles_tws_once(spark, sf_dir).collect()
    ev = load_events(spark, sf_dir)
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
        F.max(F.unix_micros(F.col("ts"))).alias("last_ts_us"),
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"], r["last_ts_us"])
           for r in out}
    want = {r["user_id"]: (r["n_events"], r["total_value"], r["last_ts_us"])
            for r in batch.collect()}
    assert got == want


def test_decayed_user_value_fixed_chain(spark):
    import datetime as dt

    from pyspark.sql import Row

    from breweries_etl_spark.operators.temporal import decayed_user_value

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=i, user_id=7, ts=t0 + dt.timedelta(minutes=i), value=float(v))
        for i, v in enumerate([8.0, 4.0, 2.0, 1.0, 16.0])
    ]
    df = spark.createDataFrame(rows)
    out = {r["event_id"]: r["decayed_value"] for r in decayed_user_value(df).collect()}
    assert out[0] == 8.0
    assert out[1] == 4.0 + 0.5 * 8.0
    assert out[2] == 2.0 + 0.5 * 4.0 + 0.25 * 8.0
    assert out[3] == 1.0 + 0.5 * 2.0 + 0.25 * 4.0 + 0.125 * 8.0
    # depth 4: event 0's value has fallen out of the window by event 4
    assert out[4] == 16.0 + 0.5 * 1.0 + 0.25 * 2.0 + 0.125 * 4.0


def test_sessionize_capped_splits_long_sessions(spark):
    import datetime as dt

    from pyspark.sql import Row

    from breweries_etl_spark.operators.temporal import sessionize_capped

    t0 = dt.datetime(2024, 1, 1)
    # continuous activity every 20 min for 9 hours -> one gap-session,
    # split into ceil(9h/4h) = 3 duration buckets
    rows = [
        Row(event_id=i, user_id=1, ts=t0 + dt.timedelta(minutes=20 * i), value=1.0)
        for i in range(28)
    ]
    # plus a separate burst after a 2-hour gap (new gap-session)
    rows += [
        Row(event_id=100 + i, user_id=1,
            ts=t0 + dt.timedelta(hours=11, minutes=i), value=1.0)
        for i in range(3)
    ]
    out = sessionize_capped(spark.createDataFrame(rows)).collect()
    by_key = {(r["gap_session"], r["sub_session"]): r["n_events"] for r in out}
    assert set(by_key) == {(1, 0), (1, 1), (1, 2), (2, 0)}
    # 4h bucket = 12 slots of 20min; anchored at the first event
    assert by_key[(1, 0)] == 12 and by_key[(1, 1)] == 12 and by_key[(1, 2)] == 4
    assert by_key[(2, 0)] == 3
    # every sub-session spans <= 4h
    for r in out:
        assert r["end_us"] - r["start_us"] <= 4 * 3600 * 1_000_000


def test_event_gap_stats_detects_large_gap(spark):
    import pyspark.sql.functions as F

    from breweries_etl_spark.operators.temporal import event_gap_stats

    rows = [
        (1, 1, "2024-01-01 10:00:00"),
        (2, 1, "2024-01-01 10:30:00"),  # 30 min gap
        (3, 1, "2024-01-03 10:30:00"),  # 2 day gap -> large
        (4, 2, "2024-01-01 00:00:00"),  # single event: no gaps
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r for r in event_gap_stats(df, gap_threshold_s=86_400).collect()}
    assert got[1]["n_large_gaps"] == 1
    assert got[1]["max_gap_us"] == 48 * 3600 * 1_000_000
    assert got[2]["n_large_gaps"] == 0 and got[2]["max_gap_us"] is None
    assert got[2]["span_us"] == 0
