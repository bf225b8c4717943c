"""Round-9 wave-1 operators against independent Python references:
Brunner-Munzel, Theil-L/Atkinson, Chao1/Good-Turing, turning points,
Cronbach's alpha, multiclass MCC."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from breweries_etl_spark.operators.hypotests import (
    brunner_munzel,
    theil_l_atkinson,
)
from breweries_etl_spark.operators.profiling import (
    cronbach_alpha,
    mcc_multiclass,
)
from breweries_etl_spark.operators.temporal import turning_points_daily
from breweries_etl_spark.operators.text import vocab_richness


def _bm_reference(x, y):
    """scipy.stats.brunnermunzel's formulation, midranks by hand."""
    pooled = sorted(x + y)

    def midrank(v, seq):
        lo = sum(1 for s in seq if s < v)
        eq = sum(1 for s in seq if s == v)
        return lo + (eq + 1) / 2.0

    rcx = [midrank(v, pooled) for v in x]
    rcy = [midrank(v, pooled) for v in y]
    rx = [midrank(v, x) for v in x]
    ry = [midrank(v, y) for v in y]
    nx, ny = len(x), len(y)
    mcx, mcy = sum(rcx) / nx, sum(rcy) / ny
    sx = sum(
        (rcx[i] - rx[i] - mcx + (nx + 1) / 2.0) ** 2 for i in range(nx)
    ) / (nx - 1)
    sy = sum(
        (rcy[i] - ry[i] - mcy + (ny + 1) / 2.0) ** 2 for i in range(ny)
    ) / (ny - 1)
    w = nx * ny * (mcy - mcx) / ((nx + ny) * math.sqrt(nx * sx + ny * sy))
    p_hat = (mcy - (ny + 1) / 2.0) / nx
    return p_hat, w


def test_brunner_munzel_matches_reference(spark):
    x = [1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 4.0, 1.0, 1.0]
    y = [3.0, 3.0, 4.0, 3.0, 1.0, 2.0, 3.0, 1.0, 1.0, 5.0, 4.0]
    rows = [(v, "a") for v in x] + [(v, "b") for v in y]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = brunner_munzel(df, "v", F.col("g") == "b").collect()[0]
    # group_expr TRUE marks group A in the prefix primitive; the
    # operator contract is B = group_expr FALSE... assert against the
    # convention actually implemented: A = matched rows.
    p_ref, w_ref = _bm_reference(y, x)
    assert r["n_a"] == len(y) and r["n_b"] == len(x)
    assert abs(float(r["p_hat"]) - p_ref) < 1e-6
    assert abs(float(r["bm_stat"]) - w_ref) < 1e-5


def test_brunner_munzel_symmetry(spark):
    """Swapping the groups must flip the statistic's sign and map
    p_hat -> 1 - p_hat."""
    rows = [(float(i % 7) + (0.5 if i % 3 == 0 else 0.0),
             "a" if i % 2 == 0 else "b") for i in range(40)]
    df = spark.createDataFrame(rows, ["v", "g"])
    r1 = brunner_munzel(df, "v", F.col("g") == "a").collect()[0]
    r2 = brunner_munzel(df, "v", F.col("g") == "b").collect()[0]
    assert abs(float(r1["p_hat"]) + float(r2["p_hat"]) - 1.0) < 1e-6
    assert abs(float(r1["bm_stat"]) + float(r2["bm_stat"])) < 1e-5


def test_theil_l_atkinson_known_values(spark):
    vals = [1.0, 1.0, 4.0, 10.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["k", "x"]
    )
    r = theil_l_atkinson(df, "k", "x").collect()[0]
    mu = sum(vals) / len(vals)
    lsum = sum(round(math.log(v), 6) for v in vals)
    theil_l = math.log(mu) - lsum / len(vals)
    assert r["n_keys"] == 4
    assert abs(float(r["theil_l"]) - theil_l) < 1e-6
    assert abs(float(r["atkinson_1"]) - (1 - math.exp(-theil_l))) < 1e-6


def test_theil_l_excludes_nonpositive_keys(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 0.0), (4, -2.0)], ["k", "x"]
    )
    r = theil_l_atkinson(df, "k", "x").collect()[0]
    assert r["n_keys"] == 2
    assert abs(float(r["theil_l"])) < 1e-9  # equal values -> L = 0


def test_vocab_richness_counts(spark):
    df = spark.createDataFrame(
        [("a a b c",), ("c d e",)], ["text"]
    )
    r = vocab_richness(df).collect()[0]
    # freqs: a=2 b=1 c=2 d=1 e=1 -> N=7 V=5 F1=3 F2=2
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (7, 5, 3, 2)
    assert abs(float(r["chao1"]) - (5 + 3 * 2 / (2 * 3))) < 1e-9
    assert abs(float(r["gt_unseen_mass"]) - 3 / 7) < 1e-6


def test_turning_points_alternating_series(spark):
    """A strictly alternating series turns at EVERY interior point."""
    import datetime

    rows = []
    for i in range(10):
        ts = datetime.datetime(2024, 1, 1 + i)
        rows.append(("u", ts, 10.0 if i % 2 == 0 else 1.0))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    r = turning_points_daily(df).collect()[0]
    assert r["n_days"] == 10 and r["n_turning"] == 8
    mean = 2 * (10 - 2) / 3.0
    var = (16 * 10 - 29) / 90.0
    assert abs(float(r["z_score"]) - (8 - mean) / math.sqrt(var)) < 1e-6


def test_cronbach_alpha_reference(spark):
    rows = [
        (2.0, 3.0, 3.0), (4.0, 4.0, 5.0), (1.0, 2.0, 2.0),
        (5.0, 4.0, 5.0), (3.0, 3.0, 4.0),
    ]
    df = spark.createDataFrame(rows, ["i1", "i2", "i3"])
    r = cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]

    def svar(xs):
        m = sum(xs) / len(xs)
        return sum((v - m) ** 2 for v in xs) / (len(xs) - 1)

    items = list(zip(*rows))
    tot = [sum(t) for t in rows]
    alpha = 1.5 * (1 - sum(svar(i) for i in items) / svar(tot))
    assert r["n"] == 5 and r["k_items"] == 3
    assert abs(float(r["alpha"]) - alpha) < 1e-6


def test_mcc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [("a", "a")] * 5 + [("b", "b")] * 5, ["t", "p"]
    )
    r = mcc_multiclass(perfect, "t", "p").collect()[0]
    assert float(r["mcc"]) == 1.0 and float(r["accuracy"]) == 1.0
    # statistically independent labels -> MCC 0 (balanced 2x2 with
    # identical marginals and diagonal = expected)
    indep = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 3, ["t", "p"]
    )
    r2 = mcc_multiclass(indep, "t", "p").collect()[0]
    assert abs(float(r2["mcc"])) < 1e-9


def test_mcc_matches_sklearn_formula(spark):
    rows = [("a", "a")] * 8 + [("a", "b")] * 2 + [("b", "b")] * 6 + \
        [("b", "c")] * 1 + [("c", "c")] * 4 + [("c", "a")] * 2
    df = spark.createDataFrame(rows, ["t", "p"])
    r = mcc_multiclass(df, "t", "p").collect()[0]
    classes = sorted({t for t, _ in rows} | {p for _, p in rows})
    t_k = {c: sum(1 for t, _ in rows if t == c) for c in classes}
    p_k = {c: sum(1 for _, p in rows if p == c) for c in classes}
    s = len(rows)
    c = sum(1 for t, p in rows if t == p)
    tp = sum(t_k[k] * p_k[k] for k in classes)
    mcc = (c * s - tp) / math.sqrt(
        (s * s - sum(v * v for v in p_k.values()))
        * (s * s - sum(v * v for v in t_k.values()))
    )
    assert abs(float(r["mcc"]) - mcc) < 1e-6
    assert r["n_classes"] == 3
