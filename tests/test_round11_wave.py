"""Round-11 wave 21: Rosner generalized-ESD rounds, Hill-number
diversity profile, Quade blocked-rank test — golden values regenerated
from independent plain-Python implementations of the published
procedures (naive recompute-mean-each-round ESD; Jost 2006 Hill
numbers; Conover's Quade with midranks)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_generalized_esd_matches_naive_reference(spark):
    """Fixture with two high and one low outlier; values match the
    naive recompute-the-moments-each-round reference (validated in the
    r11 session against a fresh implementation)."""
    from breweries_etl_spark.operators.hypotests import generalized_esd_rounds

    xs = [2.0, 2.1, 2.2, 1.9, 2.0, 2.1, 9.5, -4.0, 2.05, 2.15, 8.0]
    df = spark.createDataFrame([(float(v),) for v in xs], "v double")
    got = [
        (r["round"], r["n_before"], r["removed_value"], r["r_stat"])
        for r in generalized_esd_rounds(df, "v").collect()
    ]
    assert got == [
        (1, 11, 9.5, 1.934853),
        (2, 10, -4.0, 2.137959),
        (3, 9, 8.0, 2.663958),
    ]


def test_generalized_esd_symmetric_ties_take_max(spark):
    """|max-mean| == |min-mean| exactly -> the max end is removed
    (documented tie-break); subsequent rounds reshape around it."""
    from breweries_etl_spark.operators.hypotests import generalized_esd_rounds

    df = spark.createDataFrame(
        [(10.0,), (-10.0,), (10.0,), (-10.0,), (0.0,)], "v double"
    )
    got = [
        (r["round"], r["n_before"], r["removed_value"], r["r_stat"])
        for r in generalized_esd_rounds(df, "v").collect()
    ]
    assert got == [
        (1, 5, 10.0, 1.0),
        (2, 4, 10.0, 1.305582),
        (3, 3, 0.0, 1.154701),
    ]


def test_generalized_esd_degenerate_inputs_emit_zero_rows(spark):
    """Zero variance, n < 3, and empty input are all no-round cases —
    0 rows on BOTH engines (the documented contract; no anchor)."""
    from breweries_etl_spark.operators.hypotests import generalized_esd_rounds

    const = spark.createDataFrame([(3.0,)] * 5, "v double")
    assert generalized_esd_rounds(const, "v").count() == 0
    two = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    assert generalized_esd_rounds(two, "v").count() == 0
    empty = spark.createDataFrame([], "v double")
    assert generalized_esd_rounds(empty, "v").count() == 0


def test_hill_profile_uniform_is_category_count(spark):
    """Uniform mix: every Hill number equals the category count (the
    defining calibration property); NULL is a real category."""
    from breweries_etl_spark.operators.corpus import hill_diversity_profile

    uni = spark.createDataFrame(
        [(c,) for c in ["a", "b", "c", None] * 5], "source string"
    )
    r = hill_diversity_profile(uni, "source").collect()[0]
    assert r["n_rows"] == 20 and r["hill_d0"] == 4
    # d1 rides the round-6 per-term entropy fold: an ulp off exact 4
    assert abs(float(r["hill_d1"]) - 4.0) < 1e-4
    assert float(r["hill_d2"]) == 4.0
    assert float(r["hill_dinf"]) == 4.0


def test_hill_profile_skewed_matches_reference(spark):
    """9:1 two-category mix — exact-rational D2 = 1/0.82, Dinf = 10/9,
    D1 = exp(H); ordering Dinf <= D2 <= D1 <= D0 must hold."""
    from breweries_etl_spark.operators.corpus import hill_diversity_profile

    df = spark.createDataFrame([("a",)] * 9 + [("b",)], "source string")
    r = hill_diversity_profile(df, "source").collect()[0]
    assert r["hill_d0"] == 2
    assert float(r["hill_d1"]) == 1.384146
    assert float(r["hill_d2"]) == 1.219512
    assert float(r["hill_dinf"]) == 1.111111
    assert (
        float(r["hill_dinf"])
        <= float(r["hill_d2"])
        <= float(r["hill_d1"])
        <= float(r["hill_d0"])
    )


_QUADE_BLOCKS = [
    [5.0, 7.0, 7.0, 4.0],
    [3.0, 6.0, 8.0, 3.0],
    [1.0, 4.0, 9.0, 2.0],
    [2.0, 2.0, 5.0, 2.0],
    [4.0, 6.0, 9.0, 1.0],
]


def _quade_df(spark, skip=None):
    rows = []
    for i, row in enumerate(_QUADE_BLOCKS):
        for j, v in enumerate(row):
            if skip and (i, j) == skip:
                continue
            rows.append((f"b{i}", f"t{j}", float(v)))
    return spark.createDataFrame(rows, "blk string, trt string, v double")


def test_quade_matches_naive_reference(spark):
    """Fixture has within-block value ties AND tied block ranges —
    both midrank paths exercised; F matches Conover's procedure
    computed naively."""
    from breweries_etl_spark.operators.hypotests import quade_test

    r = quade_test(_quade_df(spark), "blk", "trt", "v").collect()[0]
    assert r["n_blocks"] == 5 and r["k_treatments"] == 4
    assert float(r["quade_stat"]) == 9.915663
    assert (r["df1"], r["df2"]) == (3, 12)


def test_quade_drops_incomplete_blocks(spark):
    """Removing one cell drops that whole block (Quade requires
    complete blocks); result equals the naive reference on the
    remaining four blocks."""
    from breweries_etl_spark.operators.hypotests import quade_test

    r = quade_test(
        _quade_df(spark, skip=(1, 2)), "blk", "trt", "v"
    ).collect()[0]
    assert r["n_blocks"] == 4
    assert float(r["quade_stat"]) == 7.190404
    assert (r["df1"], r["df2"]) == (3, 9)


def test_quade_single_treatment_one_null_row(spark):
    """k < 2 (including empty input) emits the 1-row NULL-stat
    guarantee, mirrored by the oracle's CASE."""
    from breweries_etl_spark.operators.hypotests import quade_test

    one = spark.createDataFrame(
        [("b1", "t0", 1.0), ("b2", "t0", 2.0)],
        "blk string, trt string, v double",
    )
    r = quade_test(one, "blk", "trt", "v").collect()
    assert len(r) == 1
    assert r[0]["k_treatments"] == 1 and r[0]["quade_stat"] is None
    empty = one.filter(F.lit(False))
    r2 = quade_test(empty, "blk", "trt", "v").collect()
    assert len(r2) == 1 and r2[0]["k_treatments"] == 0


def test_quade_perfect_agreement_is_null_and_noisy_effect_is_large(spark):
    """PERFECT cross-block agreement makes A - B = 0 (F = +inf in
    Conover's account) — the denom>0 guard emits NULL, documented.
    Breaking one block's ordering makes F finite and large."""
    from breweries_etl_spark.operators.hypotests import quade_test

    perfect = [
        (f"b{i}", f"t{j}", float(j * 10 + i))
        for i in range(6)
        for j in range(3)
    ]
    df = spark.createDataFrame(perfect, "blk string, trt string, v double")
    r = quade_test(df, "blk", "trt", "v").collect()[0]
    assert r["quade_stat"] is None and r["n_blocks"] == 6

    noisy = [
        (b, t, (1.0 if (b, t) == ("b0", "t0") else 0.0) + v)
        for b, t, v in perfect
    ]
    # flip block b0's bottom pair so agreement is no longer perfect
    noisy = [
        (b, t, 25.0 if (b, t) == ("b0", "t0") else v) for b, t, v in noisy
    ]
    df2 = spark.createDataFrame(noisy, "blk string, trt string, v double")
    r2 = quade_test(df2, "blk", "trt", "v").collect()[0]
    assert math.isfinite(float(r2["quade_stat"]))
    assert float(r2["quade_stat"]) > 10.0


def _events_df(spark, ys, month="01"):
    rows = [
        (i, f"2024-{month}-{i+1:02d} 10:00:00", 1, "view", float(v), None)
        for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_snht_matches_naive_reference(spark):
    """Fresh naive SNHT (standardize by global population sd, max over
    prefix splits) on a series with a level shift after day 4."""
    from breweries_etl_spark.operators.temporal import snht_daily_value

    ys = [5.0, 7.0, 6.0, 8.0, 20.0, 22.0, 21.0, 25.0, 24.0, 30.0]
    r = snht_daily_value(_events_df(spark, ys)).collect()[0]
    assert r["n_days"] == 10
    assert float(r["t_stat"]) == 9.095508  # naive reference, k = 4
    assert r["change_day"] == 19726  # 2024-01-04


def test_snht_clean_break_and_degenerate_guarantee(spark):
    """A clean two-level series maximizes T exactly at the break
    (T = 6.0 for 3+3 at any shift size — scale-invariant); zero
    variance / single-day / empty inputs emit the 1-row NULL row."""
    from breweries_etl_spark.operators.temporal import snht_daily_value

    r = snht_daily_value(
        _events_df(spark, [10.0, 10.0, 10.0, 30.0, 30.0, 30.0])
    ).collect()[0]
    assert float(r["t_stat"]) == 6.0 and r["change_day"] == 19725

    const = snht_daily_value(_events_df(spark, [3.0, 3.0, 3.0])).collect()
    assert len(const) == 1 and const[0]["t_stat"] is None
    one = snht_daily_value(_events_df(spark, [4.0])).collect()
    assert len(one) == 1 and one[0]["n_days"] == 1
    empty = snht_daily_value(
        _events_df(spark, [4.0]).filter(F.lit(False))
    ).collect()
    assert len(empty) == 1 and empty[0]["n_days"] == 0


def test_dcor_matches_naive_szekely(spark):
    """Value totals strongly tied to event counts by construction;
    matches the naive double-centering definition (validated fresh in
    the r11 session)."""
    from breweries_etl_spark.operators.temporal import (
        distance_correlation_daily,
    )

    days = [(120.0, 3), (80.0, 2), (200.0, 5), (50.0, 1), (90.0, 2), (300.0, 6)]
    rows = []
    eid = 0
    for i, (tot, m) in enumerate(days):
        for e in range(m):
            rows.append(
                (eid, f"2024-02-{i+1:02d} 0{e}:00:00", 1, "view", tot / m, None)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = distance_correlation_daily(ev).collect()[0]
    assert r["n_days"] == 6
    assert float(r["dcor2"]) == 0.970132
    assert float(r["dcor"]) == 0.984953


def test_dcor_constant_count_is_null(spark):
    """One event per day -> the count series is constant -> dVar_y = 0
    -> dCor undefined (NULL), n_days still reported."""
    from breweries_etl_spark.operators.temporal import (
        distance_correlation_daily,
    )

    r = distance_correlation_daily(
        _events_df(spark, [5.0, 9.0, 3.0], month="03")
    ).collect()[0]
    assert r["n_days"] == 3 and r["dcor"] is None
