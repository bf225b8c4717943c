"""Bin-bucketed range joins: exactness vs naive formulations, exactly-once
emission across bin boundaries, inclusive/exclusive endpoint semantics,
and the no-nested-loop plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from breweries_etl_spark.operators.rangejoin import (
    error_window_coverage,
    interval_overlap_join,
    point_in_interval_join,
    session_overlap_pairs,
)
from breweries_etl_spark.sources.tables import load_events

US = 1_000_000


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pt_id long, ts_us long")


def _ivls(spark, rows):
    return spark.createDataFrame(rows, "ivl_id long, start_us long, end_us long")


def test_point_in_interval_endpoints_and_multibin(spark):
    # Interval [100s, 2000s) spans many 600s bins; points probe both ends.
    ivls = _ivls(spark, [(1, 100 * US, 2000 * US)])
    pts = _pts(
        spark,
        [
            (10, 99 * US),  # before start -> no match
            (11, 100 * US),  # at start (inclusive) -> match
            (12, 700 * US),  # mid, different bin than start -> match once
            (13, 1999 * US),  # just inside end -> match
            (14, 2000 * US),  # at end (exclusive) -> no match
        ],
    )
    got = point_in_interval_join(pts, ivls, point_ts="ts_us", bin_width_us=600 * US)
    assert sorted(r.pt_id for r in got.collect()) == [11, 12, 13]
    # exactly-once even though the interval covers 4 bins
    assert got.count() == 3


def test_point_in_interval_matches_naive_crossjoin(spark):
    ivls = _ivls(
        spark,
        [(i, i * 50 * US, (i * 50 + 120) * US) for i in range(40)],
    )
    pts = _pts(spark, [(p, p * 7 * US) for p in range(300)])
    fast = point_in_interval_join(pts, ivls, bin_width_us=100 * US)
    naive = (
        pts.crossJoin(ivls)
        .where((F.col("ts_us") >= F.col("start_us")) & (F.col("ts_us") < F.col("end_us")))
    )
    f = sorted((r.pt_id, r.ivl_id) for r in fast.collect())
    n = sorted((r.pt_id, r.ivl_id) for r in naive.collect())
    assert f == n and len(f) > 0


def test_interval_overlap_exactly_once_shared_bins(spark):
    # Two long intervals sharing MANY bins must still pair exactly once;
    # touching intervals (closed semantics) must pair; disjoint must not.
    left = spark.createDataFrame(
        [(1, 0, 10_000 * US), (2, 20_000 * US, 20_000 * US)],
        "l_id long, l_start_us long, l_end_us long",
    )
    right = spark.createDataFrame(
        [(1, 500 * US, 9_000 * US), (2, 10_000 * US, 11_000 * US), (3, 50_000 * US, 60_000 * US)],
        "r_id long, r_start_us long, r_end_us long",
    )
    got = interval_overlap_join(left, right, bin_width_us=1000 * US)
    pairs = sorted((r.l_id, r.r_id) for r in got.collect())
    # l1 overlaps r1 (nested) and r2 (touching at 10_000s); l2 (zero-length)
    # overlaps nothing; r3 disjoint.
    assert pairs == [(1, 1), (1, 2)]


def test_error_window_coverage_matches_naive(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    fast = error_window_coverage(ev)
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600 * US).alias("e"),
    )
    pts = ev.where(F.col("event_type") != "error").select(
        F.unix_micros("ts").alias("us")
    )
    naive = (
        pts.crossJoin(err)
        .where((F.col("us") >= F.col("s")) & (F.col("us") < F.col("e")))
        .groupBy("err_id")
        .count()
    )
    f = {r.err_id: r.n_covered for r in fast.collect()}
    n = {r.err_id: r["count"] for r in naive.collect()}
    assert f == n and len(f) > 0


def test_session_overlap_symmetric_free(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    got = session_overlap_pairs(ev).collect()
    for r in got:
        assert r.user_a < r.user_b
        assert r.total_overlap_us >= 0


def test_no_nested_loop_join_in_plan(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    plan = error_window_coverage(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    plan2 = session_overlap_pairs(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan2
    assert "CartesianProduct" not in plan2
