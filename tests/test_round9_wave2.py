"""Round-9 wave-7 operators against independent references:
standardized k-sample AD (Scholz-Stephens published value), Cuzick
trend, Goodman-Kruskal lambda, max drawdown."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from breweries_etl_spark.operators.hypotests import (
    ad_ksample,
    cuzick_trend,
    gk_lambda,
)
from breweries_etl_spark.operators.temporal import max_drawdown_daily

# Scholz & Stephens (1987) Table 1 laboratory smoothness data
_T1 = [38.7, 41.5, 43.8, 44.5, 45.5, 46.0, 47.7, 58.0]
_T2 = [39.2, 39.3, 39.7, 41.4, 41.8, 42.9, 43.3, 45.8]
_T3 = [34.0, 35.0, 39.0, 40.0, 43.0, 43.0, 44.0, 45.0]
_T4 = [34.0, 34.8, 34.8, 35.4, 37.2, 37.8, 41.2, 42.8]


def test_ad_ksample_standardized_published_value(spark):
    """The paper reports A2kN = 8.3559, sigma_N = 1.2038, standardized
    T = 4.449 for the 4-lab smoothness data (right-continuous form).
    Our raw column is N*A2kN (documented)."""
    rows = (
        [(v, "g1") for v in _T1]
        + [(v, "g2") for v in _T2]
        + [(v, "g3") for v in _T3]
        + [(v, "g4") for v in _T4]
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    r = ad_ksample(
        df, "g", "v", ["g1", "g2", "g3", "g4"], standardized=True
    ).collect()[0]
    assert r["n"] == 32 and r["k_groups"] == 4
    assert abs(r["ad_ksample"] / 32.0 - 8.3559) < 2e-4
    assert abs(r["standardized_stat"] - 4.4493) < 2e-3


def test_ad_ksample_standardized_small_n_null(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, "a")], ["v", "g"]
    )
    r = ad_ksample(df, "g", "v", ["a", "b"], standardized=True).collect()[0]
    assert r["standardized_stat"] is None  # N < 4: sigma_N undefined


def _cuzick_reference(samples):
    """Direct midrank implementation of the linear-rank moments."""
    pooled = sorted(v for s in samples for v in s)
    n = len(pooled)

    def midrank(v):
        lo = sum(1 for s in pooled if s < v)
        eq = sum(1 for s in pooled if s == v)
        return lo + (eq + 1) / 2.0

    t = sum(
        li * sum(midrank(v) for v in s) for li, s in enumerate(samples)
    )
    snl = sum(li * len(s) for li, s in enumerate(samples))
    snl2 = sum(li * li * len(s) for li, s in enumerate(samples))
    sbar = (n + 1) / 2.0
    ssq = sum(midrank(v) ** 2 for v in pooled)
    e_t = snl * sbar
    var_t = (snl2 - snl * snl / n) * (ssq - n * sbar * sbar) / (n - 1)
    return t, e_t, (t - e_t) / math.sqrt(var_t)


def test_cuzick_trend_matches_reference(spark):
    g0 = [2.0, 3.0, 3.0, 4.0, 5.0, 2.0]
    g1 = [3.0, 4.0, 4.0, 5.0, 6.0]
    g2 = [5.0, 5.0, 6.0, 7.0, 8.0, 6.0, 4.0]
    rows = (
        [(v, "low") for v in g0]
        + [(v, "mid") for v in g1]
        + [(v, "high") for v in g2]
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    r = cuzick_trend(df, "g", "v", ["low", "mid", "high"]).collect()[0]
    t_ref, e_ref, z_ref = _cuzick_reference([g0, g1, g2])
    assert r["n"] == 18 and r["k_groups"] == 3
    assert abs(r["t_stat"] - t_ref) < 1e-6
    assert abs(r["expected_t"] - e_ref) < 1e-6
    assert abs(r["z_score"] - z_ref) < 1e-5


def test_cuzick_no_trend_is_near_zero(spark):
    # identical distributions in every group: z should be small
    rows = [
        (float(v), g)
        for g in ("a", "b", "c")
        for v in (1, 2, 3, 4, 5, 6, 7, 8)
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = cuzick_trend(df, "g", "v", ["a", "b", "c"]).collect()[0]
    assert abs(r["z_score"]) < 1e-9  # exactly balanced midranks


def test_gk_lambda_hand_example(spark):
    # classic 2x2: Y fully determined by X -> lambda(Y|X)=1
    rows = [("a", "p")] * 10 + [("b", "q")] * 10
    df = spark.createDataFrame(rows, ["x", "y"])
    r = gk_lambda(df, "x", "y").collect()[0]
    assert r["lambda_y_given_x"] == 1.0
    assert r["lambda_x_given_y"] == 1.0
    assert r["lambda_sym"] == 1.0


def test_gk_lambda_independence_zero(spark):
    # uniform independent table: knowing X never improves the modal
    # guess -> all lambdas 0
    rows = [
        (x, y) for x in ("a", "b") for y in ("p", "q") for _ in range(5)
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = gk_lambda(df, "x", "y").collect()[0]
    assert r["lambda_y_given_x"] == 0.0
    assert r["lambda_x_given_y"] == 0.0
    assert r["lambda_sym"] == 0.0


def test_gk_lambda_asymmetric(spark):
    # Goodman & Kruskal-style asymmetric table: column var predicts
    # row var perfectly but not conversely
    rows = (
        [("a", "p")] * 6 + [("b", "p")] * 4
        + [("a", "q")] * 0 + [("b", "q")] * 5
    )
    df = spark.createDataFrame(rows, ["x", "y"])
    r = gk_lambda(df, "x", "y").collect()[0]
    # by hand: N=15, cells a/p=6 b/p=4 b/q=5
    # lambda(Y|X): sum_x max_y = 6 + 5 = 11; max col marginal: p=10
    #   -> (11-10)/(15-10) = 0.2
    # lambda(X|Y): sum_y max_x = 6 (p) + 5 (q) = 11; max row: b=9
    #   -> (11-9)/(15-9) = 2/6
    assert abs(r["lambda_y_given_x"] - 0.2) < 1e-9
    assert abs(r["lambda_x_given_y"] - 2.0 / 6.0) < 1e-6
    assert abs(r["lambda_sym"] - (11 + 11 - 10 - 9) / (30 - 10 - 9)) < 1e-6


def test_max_drawdown_hand_series(spark):
    # days: values 10, 14, 9, 12, 6, 8 -> running peaks
    # 10,14,14,14,14,14; drawdowns 0,0,5,2,8,6 -> max 8, pct 8/14
    rows = [
        ("2024-01-0%d 12:00:00" % (i + 1), v)
        for i, v in enumerate([10.0, 14.0, 9.0, 12.0, 6.0, 8.0])
    ]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    r = max_drawdown_daily(df).collect()[0]
    assert r["n_days"] == 6
    assert r["peak_value"] == 14.0
    assert r["max_drawdown"] == 8.0
    assert abs(r["max_drawdown_pct"] - 8.0 / 14.0) < 1e-6


def test_max_drawdown_monotone_rise_is_zero(spark):
    rows = [
        ("2024-02-0%d 00:30:00" % (i + 1), float(v))
        for i, v in enumerate([1, 2, 3, 4, 5])
    ]
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    r = max_drawdown_daily(df).collect()[0]
    assert r["max_drawdown"] == 0.0
    assert r["max_drawdown_pct"] == 0.0


# ---- wave 8: Youden J, BWS, Mardia kurtosis ----

from breweries_etl_spark.operators.hypotests import (  # noqa: E402
    bws_test,
    mardia_kurtosis,
    youden_j,
)


def test_youden_j_matches_brute_force(spark):
    scores = [
        (0.1, 0), (0.2, 0), (0.3, 1), (0.35, 0), (0.5, 1),
        (0.6, 1), (0.7, 0), (0.8, 1), (0.9, 1),
    ]
    df = spark.createDataFrame(scores, ["s", "y"])
    r = youden_j(df, "s", F.col("y") == 1).collect()[0]
    n_pos = sum(1 for _, y in scores if y)
    n_neg = len(scores) - n_pos
    best = (-1.0, None)
    for v in sorted({s for s, _ in scores}):
        tp = sum(1 for s, y in scores if y and s > v)
        fp = sum(1 for s, y in scores if not y and s > v)
        j = tp / n_pos - fp / n_neg
        if j > best[0] + 1e-12:
            best = (j, v)
    assert r["n_pos"] == n_pos and r["n_neg"] == n_neg
    assert abs(r["youden_j"] - best[0]) < 1e-6
    assert abs(r["best_threshold"] - best[1]) < 1e-12
    assert abs((r["tpr"] - r["fpr"]) - r["youden_j"]) < 2e-6


def test_youden_j_useless_score_is_zero(spark):
    # label independent of score: every threshold keeps TPR == FPR
    rows = [(float(i), i % 2) for i in range(1, 21)]
    # interleave so score > v cuts pos/neg equally at even counts
    df = spark.createDataFrame(
        [(s, y) for s, y in rows], ["s", "y"]
    )
    r = youden_j(df, "s", F.col("y") == 1).collect()[0]
    assert r["youden_j"] >= 0.0  # never negative by construction
    assert r["youden_j"] <= 0.11  # at most one element of imbalance


def _bws_reference(x, y):
    pooled = sorted(x + y)

    def midrank(v):
        lo = sum(1 for p in pooled if p < v)
        eq = sum(1 for p in pooled if p == v)
        return lo + (eq + 1) / 2.0

    def bpart(a, b):
        n, m = len(a), len(b)
        nn = n + m
        s = 0.0
        for i, v in enumerate(sorted(a), 1):
            dev = midrank(v) - nn / n * i
            den = (i / (n + 1)) * (1 - i / (n + 1)) * (m * nn / n)
            s += dev * dev / den
        return s / n

    ba, bb = bpart(x, y), bpart(y, x)
    return ba, bb, (ba + bb) / 2


def test_bws_matches_reference(spark):
    x = [1.2, 2.4, 3.1, 4.7, 5.5, 6.6, 7.1]
    y = [2.0, 3.9, 4.1, 5.0, 6.0, 8.2, 9.9, 10.5]
    rows = [(v, "x") for v in x] + [(v, "y") for v in y]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = bws_test(df, "v", F.col("g") == "x").collect()[0]
    ba, bb, b = _bws_reference(x, y)
    assert r["n_a"] == 7 and r["n_b"] == 8
    assert abs(r["b_a"] - ba) < 1e-5
    assert abs(r["b_b"] - bb) < 1e-5
    assert abs(r["bws_b"] - b) < 1e-5


def test_bws_with_ties_matches_reference(spark):
    x = [1.0, 2.0, 2.0, 3.0, 5.0]
    y = [2.0, 4.0, 4.0, 6.0, 6.0, 7.0]
    rows = [(v, "x") for v in x] + [(v, "y") for v in y]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = bws_test(df, "v", F.col("g") == "x").collect()[0]
    ba, bb, b = _bws_reference(x, y)
    assert abs(r["bws_b"] - b) < 1e-5


def test_mardia_kurtosis_matches_reference(spark):
    import random

    random.seed(7)
    pts = [
        (round(random.gauss(100, 10), 2), round(random.gauss(50, 5), 2))
        for _ in range(500)
    ]
    df = spark.createDataFrame(pts, ["x", "y"])
    r = mardia_kurtosis(df, "x", "y").collect()[0]
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    vxx = sum((p[0] - mx) ** 2 for p in pts) / n
    vyy = sum((p[1] - my) ** 2 for p in pts) / n
    vxy = sum((p[0] - mx) * (p[1] - my) for p in pts) / n
    det = vxx * vyy - vxy * vxy
    b2 = sum(
        (
            (
                vyy * (p[0] - mx) ** 2
                - 2 * vxy * (p[0] - mx) * (p[1] - my)
                + vxx * (p[1] - my) ** 2
            )
            / det
        )
        ** 2
        for p in pts
    ) / n
    z = (b2 - 8) / math.sqrt(32 / n)
    assert r["n"] == n
    assert abs(r["b2_kurtosis"] - b2) < 1e-4
    assert abs(r["z_score"] - z) < 1e-3


def test_mardia_kurtosis_degenerate_null(spark):
    # perfectly collinear pair: det = 0 -> NULL stats, no crash
    pts = [(float(i), 2.0 * i) for i in range(1, 40)]
    df = spark.createDataFrame(pts, ["x", "y"])
    r = mardia_kurtosis(df, "x", "y").collect()[0]
    assert r["n"] == 39
    assert r["b2_kurtosis"] is None and r["z_score"] is None


# ---- wave 9: Gries DP, lexical constants, KPSS ----

import re  # noqa: E402
from collections import Counter  # noqa: E402

from breweries_etl_spark.operators.text import (  # noqa: E402
    lexical_constants,
    term_dispersion_dp,
)
from breweries_etl_spark.operators.temporal import kpss_level_daily  # noqa: E402

_DOCS = [
    ("the cat sat on the mat", "s1"),
    ("the dog ran fast the end", "s1"),
    ("cat and dog and bird", "s2"),
    ("the bird flew over the hill", "s2"),
    ("hill and mat and end of story", "s3"),
]


def test_term_dispersion_dp_matches_reference(spark):
    df = spark.createDataFrame(_DOCS, ["text", "source"])
    out = {
        r["term"]: r
        for r in term_dispersion_dp(df, k=5, min_freq=2).collect()
    }
    toks = [
        (s, t)
        for txt, s in _DOCS
        for t in re.findall(r"[a-z0-9_]+", txt.lower())
    ]
    big_t = len(toks)
    src_tot = Counter(s for s, _ in toks)
    term_src = Counter((t, s) for s, t in toks)
    term_tot = Counter(t for _, t in toks)
    assert len(out) == 5
    for term, r in out.items():
        dp_ref = 0.5 * sum(
            abs(
                term_src.get((term, s), 0) / term_tot[term]
                - src_tot[s] / big_t
            )
            for s in src_tot
        )
        assert abs(r["dp"] - dp_ref) < 1e-6, term
        assert r["corpus_freq"] == term_tot[term]
    # "the" occurs in line with source shares -> lower DP than "bird",
    # which is concentrated in one source
    assert out["the"]["dp"] < out["bird"]["dp"]


def test_lexical_constants_match_reference(spark):
    df = spark.createDataFrame(_DOCS, ["text", "source"])
    r = lexical_constants(df).collect()[0]
    toks = [
        t for txt, _ in _DOCS for t in re.findall(r"[a-z0-9_]+", txt.lower())
    ]
    tf = Counter(toks)
    n, v = sum(tf.values()), len(tf)
    v1 = sum(1 for f in tf.values() if f == 1)
    v2 = sum(1 for f in tf.values() if f == 2)
    assert (r["n_tokens"], r["n_types"], r["v1"], r["v2"]) == (n, v, v1, v2)
    assert abs(r["herdan_c"] - math.log(v) / math.log(n)) < 1e-6
    assert abs(r["brunet_w"] - n ** (v**-0.165)) < 1e-4
    assert abs(r["sichel_s"] - v2 / v) < 1e-6
    assert abs(r["honore_r"] - 100 * math.log(n) / (1 - v1 / v)) < 1e-4


def _kpss_reference(vals, lags=7):
    n = len(vals)
    mean = sum(vals) / n
    e = [v - mean for v in vals]
    acc, s = 0.0, []
    for x in e:
        acc += x
        s.append(acc)
    num = sum(v * v for v in s)
    g = [
        sum(e[t] * e[t - j] for t in range(j, n))
        for j in range(0, lags + 1)
    ]
    s2 = (
        g[0]
        + 2 * sum((1 - j / (lags + 1)) * g[j] for j in range(1, lags + 1))
    ) / n
    return s2, num / (n * n) / s2


def _daily_df(spark, vals, fmt="2024-%02d-%02d 10:00:00"):
    rows = [
        (fmt % (1 + i // 28, 1 + i % 28), float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def test_kpss_random_walk_rejects(spark):
    import random

    random.seed(3)
    vals, lvl = [], 100.0
    for _ in range(60):
        lvl += random.gauss(0, 2)
        vals.append(round(lvl, 2))
    r = kpss_level_daily(_daily_df(spark, vals)).collect()[0]
    s2_ref, eta_ref = _kpss_reference(vals)
    assert r["n_days"] == 60 and r["lags"] == 7
    assert abs(r["s2_longrun"] - s2_ref) < 1e-3
    assert abs(r["kpss_stat"] - eta_ref) < 1e-4
    # a random walk should look non-stationary: far above the 1%
    # critical value 0.739 for the level test
    assert r["kpss_stat"] > 0.739


def test_kpss_stationary_noise_accepts(spark):
    import random

    random.seed(11)
    vals = [round(100.0 + random.gauss(0, 3), 2) for _ in range(60)]
    r = kpss_level_daily(_daily_df(spark, vals)).collect()[0]
    s2_ref, eta_ref = _kpss_reference(vals)
    assert abs(r["kpss_stat"] - eta_ref) < 1e-4
    # i.i.d. noise around a level: below the 10% critical value 0.347
    assert r["kpss_stat"] < 0.347


# ---- wave 10: Rayleigh, Mood dispersion, join-key discovery ----

from breweries_etl_spark.operators.hypotests import mood_dispersion  # noqa: E402
from breweries_etl_spark.operators.profiling import join_key_profile  # noqa: E402
from breweries_etl_spark.operators.temporal import (  # noqa: E402
    rayleigh_hour_uniformity,
)


def _ts_df(spark, stamps):
    return spark.createDataFrame([(s,) for s in stamps], ["ts"]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )


def test_rayleigh_concentrated_times(spark):
    stamps = [
        "2024-01-%02d 09:%02d:00" % (1 + i % 28, i % 60) for i in range(200)
    ]
    r = rayleigh_hour_uniformity(_ts_df(spark, stamps)).collect()[0]
    assert r["n"] == 200
    assert r["resultant_len"] > 0.99
    assert r["rayleigh_z"] > 150.0
    assert 8.9 < r["mean_hour"] < 9.6


def test_rayleigh_uniform_times(spark):
    stamps = [
        "2024-01-%02d %02d:%02d:00" % (1 + i % 28, i % 24, (7 * i) % 60)
        for i in range(240)
    ]
    r = rayleigh_hour_uniformity(_ts_df(spark, stamps)).collect()[0]
    assert r["rayleigh_z"] < 3.0  # uniform null: E[z] = 1


def test_rayleigh_matches_direct_formula(spark):
    stamps = ["2024-01-01 %02d:00:00" % h for h in (1, 2, 3, 22, 23, 9)]
    r = rayleigh_hour_uniformity(_ts_df(spark, stamps)).collect()[0]
    angles = [2 * math.pi * h / 24.0 for h in (1, 2, 3, 22, 23, 9)]
    c = sum(round(math.cos(a), 6) for a in angles)
    s = sum(round(math.sin(a), 6) for a in angles)
    n = len(angles)
    rbar = math.sqrt(c * c + s * s) / n
    hour = math.atan2(s, c) / (2 * math.pi) * 24.0
    if hour < 0:
        hour += 24.0
    assert abs(r["resultant_len"] - rbar) < 1e-6
    assert abs(r["rayleigh_z"] - n * rbar * rbar) < 1e-5
    assert abs(r["mean_hour"] - hour) < 1e-5


def _mood_reference(a, b):
    pooled = sorted(a + b)
    n = len(pooled)

    def midrank(v):
        lo = sum(1 for p in pooled if p < v)
        eq = sum(1 for p in pooled if p == v)
        return lo + (eq + 1) / 2.0

    su = [((midrank(v) - (n + 1) / 2.0) / n) ** 2 for v in pooled]
    t = sum(((midrank(v) - (n + 1) / 2.0) / n) ** 2 for v in a)
    sbar = sum(su) / n
    e = len(a) * sbar
    var = (
        len(a) * len(b) / (n * (n - 1.0))
        * sum((x - sbar) ** 2 for x in su)
    )
    return t, e, (t - e) / math.sqrt(var)


def test_mood_dispersion_matches_reference(spark):
    a = [1.0, 3.0, 5.0, 20.0, 22.0, 0.5, 18.0]  # wide
    b = [9.0, 10.0, 11.0, 10.5, 9.5, 10.2, 11.5, 9.8]  # narrow
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = mood_dispersion(df, "v", F.col("g") == "a").collect()[0]
    t_ref, e_ref, z_ref = _mood_reference(a, b)
    assert r["n_a"] == 7 and r["n_b"] == 8
    assert abs(r["t_stat"] - t_ref) < 1e-5
    assert abs(r["expected_t"] - e_ref) < 1e-5
    assert abs(r["z_score"] - z_ref) < 1e-4
    assert r["z_score"] > 2.0  # group a visibly wider


def test_mood_dispersion_ties_match_reference(spark):
    a = [1.0, 1.0, 5.0, 5.0, 9.0]
    b = [4.0, 5.0, 5.0, 6.0]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = mood_dispersion(df, "v", F.col("g") == "a").collect()[0]
    t_ref, e_ref, z_ref = _mood_reference(a, b)
    assert abs(r["t_stat"] - t_ref) < 1e-5
    assert abs(r["z_score"] - z_ref) < 1e-4


def test_join_key_profile_hand_example(spark):
    da = spark.createDataFrame([(i,) for i in [1, 2, 2, 3, 4]], ["k"])
    db = spark.createDataFrame([(i,) for i in [2, 3, 4, 5, 5, 6]], ["k"])
    r = join_key_profile([("ab", da, "k", db, "k")]).collect()[0]
    assert r["n_rows_a"] == 5 and r["n_rows_b"] == 6
    assert r["n_distinct_a"] == 4 and r["n_distinct_b"] == 5
    assert r["n_intersect"] == 3
    assert abs(r["containment_ab"] - 0.75) < 1e-9
    assert abs(r["containment_ba"] - 0.6) < 1e-9
    assert abs(r["jaccard"] - 0.5) < 1e-9
    assert abs(r["uniqueness_a"] - 0.8) < 1e-9


def test_join_key_profile_inclusion_dependency(spark):
    child = spark.createDataFrame([(i % 4,) for i in range(20)], ["fk"])
    parent = spark.createDataFrame([(i,) for i in range(6)], ["pk"])
    r = join_key_profile(
        [("fk->pk", child, "fk", parent, "pk")]
    ).collect()[0]
    assert r["containment_ab"] == 1.0  # child values all in parent
    assert r["uniqueness_b"] == 1.0  # parent is a key
    assert r["containment_ba"] < 1.0


# ---- wave 11: PACF, seasonal strength, Welch ANOVA + ddwf scale fix ----

import datetime  # noqa: E402

from breweries_etl_spark.operators.hypotests import (  # noqa: E402
    dec_double_wide_frac,
    welch_anova,
)
from breweries_etl_spark.operators.temporal import (  # noqa: E402
    pacf_daily,
    seasonal_strength_daily,
)


def test_dec_double_wide_frac_keeps_full_scale(spark):
    """Regression (round-9 welch finding): Spark's decimal subtraction
    clips (38,8)/(38,12) results to scale 6/10, so the old
    a - floor(a) fraction silently truncated; the modulo form keeps
    every digit."""
    df = spark.createDataFrame([(1,)], ["x"])
    for scale, expect in (
        (8, 123.45678912),
        (12, 123.456789123457),
    ):
        c = F.lit("123.45678912345678").cast(f"decimal(38,{scale})")
        got = df.select(dec_double_wide_frac(c).alias("v")).collect()[0]
        assert got["v"] == expect, (scale, got["v"])
    neg = F.lit("-123.45678912").cast("decimal(38,8)")
    got = df.select(dec_double_wide_frac(neg).alias("v")).collect()[0]
    assert got["v"] == -123.45678912


def _contig_df(spark, vals):
    rows = [
        (
            (
                datetime.datetime(2024, 1, 1, 10)
                + datetime.timedelta(days=i)
            ).strftime("%Y-%m-%d %H:%M:%S"),
            float(v),
        )
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def test_pacf_ar1_matches_reference(spark):
    import random

    random.seed(5)
    vals = [0.0]
    for _ in range(167):
        vals.append(0.7 * vals[-1] + random.gauss(0, 1))
    vals = [round(100 + v, 2) for v in vals]
    r = pacf_daily(_contig_df(spark, vals)).collect()[0]
    n = len(vals)
    m = sum(vals) / n
    den = sum((y - m) ** 2 for y in vals)

    def rho(k):
        return sum(
            (vals[t] - m) * (vals[t + k] - m) for t in range(n - k)
        ) / den

    r1, r2, r3 = rho(1), rho(2), rho(3)
    p11 = r1
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = p11 - p22 * p11
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    assert r["n_days"] == n
    assert abs(r["rho1"] - r1) < 1e-5
    assert abs(r["pacf2"] - p22) < 1e-4
    assert abs(r["pacf3"] - p33) < 1e-4
    # AR(1): pacf cuts off after lag 1
    assert abs(r["pacf1"]) > 0.5
    assert abs(r["pacf2"]) < 0.2 and abs(r["pacf3"]) < 0.2


def test_seasonal_strength_detects_weekly_pattern(spark):
    import random

    random.seed(9)
    strong = [
        round(
            100 + 30 * math.sin(2 * math.pi * (i % 7) / 7)
            + random.gauss(0, 2),
            2,
        )
        for i in range(140)
    ]
    r = seasonal_strength_daily(_contig_df(spark, strong)).collect()[0]
    assert r["n_days"] == 140
    assert r["seasonal_strength"] > 0.85
    noise = [round(100 + random.gauss(0, 5), 2) for _ in range(140)]
    r2 = seasonal_strength_daily(_contig_df(spark, noise)).collect()[0]
    assert r2["seasonal_strength"] < 0.35


def _welch_reference(samples):
    k = len(samples)
    ns = [len(s) for s in samples]
    ms = [sum(s) / len(s) for s in samples]
    vs = [
        sum((x - m) ** 2 for x in s) / (len(s) - 1)
        for s, m in zip(samples, ms)
    ]
    ws = [n / v for n, v in zip(ns, vs)]
    big_w = sum(ws)
    xb = sum(w * m for w, m in zip(ws, ms)) / big_w
    a = sum(w * (m - xb) ** 2 for w, m in zip(ws, ms)) / (k - 1)
    lam = sum(
        (1 - w / big_w) ** 2 / (n - 1) for w, n in zip(ws, ns)
    )
    b = 1 + 2 * (k - 2) / (k * k - 1) * lam
    return a / b, (k * k - 1) / (3 * lam)


def test_welch_anova_matches_reference(spark):
    import random

    random.seed(13)
    ga = [round(random.gauss(10, 1), 2) for _ in range(30)]
    gb = [round(random.gauss(11, 4), 2) for _ in range(25)]
    gc = [round(random.gauss(10.5, 2), 2) for _ in range(40)]
    rows = (
        [(v, "a") for v in ga]
        + [(v, "b") for v in gb]
        + [(v, "c") for v in gc]
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    r = welch_anova(df, "g", "v", ["a", "b", "c"]).collect()[0]
    w_ref, df2_ref = _welch_reference([ga, gb, gc])
    assert r["n"] == 95 and r["k_groups"] == 3
    assert abs(r["w_stat"] - w_ref) < 1e-4
    assert r["df1"] == 2.0
    assert abs(r["df2"] - df2_ref) < 1e-2


def test_welch_anova_drops_degenerate_groups(spark):
    rows = (
        [(float(v), "a") for v in (1, 2, 3, 4)]
        + [(float(v), "b") for v in (5, 6, 7)]
        + [(5.0, "c")]  # n=1: dropped
        + [(9.0, "d"), (9.0, "d")]  # zero variance: dropped
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    r = welch_anova(df, "g", "v", ["a", "b", "c", "d"]).collect()[0]
    assert r["k_groups"] == 2
    assert r["n"] == 7
    assert r["w_stat"] is not None


# ---- wave 12: portable norm_ppf + normal-scores tests ----

from breweries_etl_spark.operators.hypotests import (  # noqa: E402
    fligner_killeen,
    norm_ppf,
    van_der_waerden,
)


def _phi_inv(p):
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def test_norm_ppf_accuracy_and_bounds(spark):
    ps = [1e-8, 0.001, 0.02425, 0.1, 0.5, 0.9, 0.97575, 0.999, 1 - 1e-8]
    df = spark.createDataFrame([(p,) for p in ps], ["p"])
    rows = df.select("p", norm_ppf(F.col("p")).alias("x")).collect()
    for r in rows:
        ref = _phi_inv(r["p"])
        assert abs(r["x"] - ref) <= max(2e-9 * abs(ref), 1e-8), r
    out = spark.createDataFrame(
        [(0.0,), (1.0,), (-0.5,), (1.5,)], ["p"]
    ).select(norm_ppf(F.col("p")).alias("x")).collect()
    assert all(r["x"] is None for r in out)


def _midrank_fn(pooled):
    def mr(v):
        lo = sum(1 for p in pooled if p < v)
        eq = sum(1 for p in pooled if p == v)
        return lo + (eq + 1) / 2

    return mr


def test_van_der_waerden_matches_reference(spark):
    import random

    random.seed(21)
    ga = [round(random.gauss(10, 1), 2) for _ in range(25)]
    gb = [round(random.gauss(12, 1), 2) for _ in range(30)]
    gc = [round(random.gauss(10.5, 1), 2) for _ in range(20)]
    rows = (
        [(v, "a") for v in ga]
        + [(v, "b") for v in gb]
        + [(v, "c") for v in gc]
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    r = van_der_waerden(df, "g", "v", ["a", "b", "c"]).collect()[0]
    pooled = ga + gb + gc
    n = len(pooled)
    mr = _midrank_fn(pooled)

    def score(v):
        return round(_phi_inv(mr(v) / (n + 1)), 6)

    s2 = sum(score(v) ** 2 for v in pooled) / (n - 1)
    t = sum(
        len(s) * (sum(score(v) for v in s) / len(s)) ** 2
        for s in (ga, gb, gc)
    ) / s2
    assert r["n"] == n and r["k_groups"] == 3
    assert abs(r["t_stat"] - t) < 1e-3
    assert r["t_stat"] > 20  # clearly shifted group b


def test_fligner_killeen_matches_reference(spark):
    import random

    random.seed(22)
    ga = [round(random.gauss(10, 1), 2) for _ in range(25)]
    gb = [round(random.gauss(10, 4), 2) for _ in range(30)]
    gc = [round(random.gauss(10, 2), 2) for _ in range(20)]
    rows = (
        [(v, "a") for v in ga]
        + [(v, "b") for v in gb]
        + [(v, "c") for v in gc]
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    r = fligner_killeen(df, "g", "v", ["a", "b", "c"]).collect()[0]

    def npmedian(s):
        ss = sorted(s)
        m = len(ss)
        return (ss[(m - 1) // 2] + ss[m // 2]) / 2

    zs, labels = [], []
    for s, lab in ((ga, "a"), (gb, "b"), (gc, "c")):
        med = npmedian(s)
        for v in s:
            zs.append(abs(v - med))
            labels.append(lab)
    n = len(zs)
    mr = _midrank_fn(zs)

    def score(z):
        return round(_phi_inv(0.5 + mr(z) / (2 * (n + 1))), 6)

    allsc = [score(z) for z in zs]
    gbar = sum(allsc) / n
    v_all = sum((a - gbar) ** 2 for a in allsc) / (n - 1)
    x2 = (
        sum(
            len([1 for l in labels if l == lab])
            * (
                sum(s for s, l in zip(allsc, labels) if l == lab)
                / len([1 for l in labels if l == lab])
                - gbar
            )
            ** 2
            for lab in ("a", "b", "c")
        )
        / v_all
    )
    assert r["n"] == n and r["k_groups"] == 3
    assert abs(r["x2_stat"] - x2) < 1e-3
    assert r["x2_stat"] > 6.0  # scales clearly differ


def test_fligner_killeen_equal_scales_small(spark):
    import random

    random.seed(23)
    rows = [
        (round(random.gauss(50, 3), 2), g)
        for g in ("a", "b", "c")
        for _ in range(30)
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = fligner_killeen(df, "g", "v", ["a", "b", "c"]).collect()[0]
    # equal scales: X2 ~ chi2(2); 99th percentile is 9.21
    assert r["x2_stat"] < 9.21


# ---- wave 13: Cucconi joint location-scale, BH-FDR screen ----

from breweries_etl_spark.operators.hypotests import cucconi_test  # noqa: E402
from breweries_etl_spark.operators.temporal import (  # noqa: E402
    bh_fdr_daily_counts,
)


def _cucconi_reference(a, b):
    pooled = sorted(a + b)
    n = len(pooled)
    n1 = len(a)
    n2 = len(b)
    mr = _midrank_fn(pooled)
    rr = [mr(v) for v in a]
    ss = [n + 1 - r for r in rr]
    den = math.sqrt(n1 * n2 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    u = (6 * sum(r * r for r in rr) - n1 * (n + 1) * (2 * n + 1)) / den
    v = (6 * sum(s * s for s in ss) - n1 * (n + 1) * (2 * n + 1)) / den
    rho = 2 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    return u, v, c


def test_cucconi_matches_reference(spark):
    import random

    random.seed(31)
    a = [round(random.gauss(10, 1), 2) for _ in range(20)]
    b = [round(random.gauss(11, 2.5), 2) for _ in range(25)]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = cucconi_test(df, "v", F.col("g") == "a").collect()[0]
    u, v, c = _cucconi_reference(a, b)
    assert r["n_a"] == 20 and r["n_b"] == 25
    assert abs(r["u_stat"] - u) < 1e-5
    assert abs(r["v_stat"] - v) < 1e-5
    assert abs(r["cucconi_c"] - c) < 1e-4
    assert r["cucconi_c"] > 4.0  # location+scale both shifted


def test_cucconi_identical_samples_near_zero(spark):
    vals = [float(v) for v in range(1, 41)]
    rows = [(v, "a") for v in vals[0::2]] + [(v, "b") for v in vals[1::2]]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = cucconi_test(df, "v", F.col("g") == "a").collect()[0]
    assert r["cucconi_c"] < 1.0  # interleaved: no location/scale signal


def test_bh_fdr_flags_spike_days(spark):
    import datetime
    import random

    random.seed(32)
    rows = []
    counts = []
    for d in range(60):
        c = 100 + int(random.gauss(0, 5))
        if d in (10, 25, 40):
            c = 180
        counts.append(c)
        stamp = (
            datetime.datetime(2024, 1, 1, 12)
            + datetime.timedelta(days=d)
        ).strftime("%Y-%m-%d %H:%M:%S")
        rows += [(stamp,)] * c
    df = spark.createDataFrame(rows, ["ts"]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    r = bh_fdr_daily_counts(df).collect()[0]
    assert r["m_days"] == 60
    assert r["n_significant"] == 3  # exactly the injected spikes
    assert r["min_p"] < 1e-5


def test_bh_fdr_quiet_series_flags_nothing(spark):
    import datetime

    rows = []
    for d in range(40):
        stamp = (
            datetime.datetime(2024, 3, 1, 12)
            + datetime.timedelta(days=d)
        ).strftime("%Y-%m-%d %H:%M:%S")
        rows += [(stamp,)] * 100  # perfectly flat
    df = spark.createDataFrame(rows, ["ts"]).select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    r = bh_fdr_daily_counts(df).collect()[0]
    assert r["n_significant"] == 0
    assert r["bh_threshold"] is None


# ---- wave 14: Bartels rank von Neumann, difference-sign ----

from breweries_etl_spark.operators.temporal import (  # noqa: E402
    bartels_rank_daily,
    difference_sign_daily,
)


def _bartels_reference(vals):
    n = len(vals)
    pooled = sorted(vals)

    def midrank(v):
        lo = sum(1 for p in pooled if p < v)
        eq = sum(1 for p in pooled if p == v)
        return lo + (eq + 1) / 2

    rs = [midrank(v) for v in vals]
    rbar = sum(rs) / n
    num = sum((rs[t] - rs[t + 1]) ** 2 for t in range(n - 1))
    den = sum((r - rbar) ** 2 for r in rs)
    rvn = num / den
    return rvn, (rvn - 2.0) / math.sqrt(4.0 / n)


def test_bartels_matches_reference(spark):
    import random

    random.seed(41)
    vals = [round(100 + random.gauss(0, 10), 2) for _ in range(80)]
    r = bartels_rank_daily(_contig_df(spark, vals)).collect()[0]
    rvn_ref, z_ref = _bartels_reference(vals)
    assert r["n_days"] == 80
    assert abs(r["rvn_ratio"] - rvn_ref) < 1e-5
    assert abs(r["z_score"] - z_ref) < 1e-4
    assert abs(r["z_score"]) < 3.0  # i.i.d. noise: near the null


def test_bartels_trending_series_rejects(spark):
    vals = [float(i) + (0.3 if i % 2 else 0.0) for i in range(60)]
    r = bartels_rank_daily(_contig_df(spark, vals)).collect()[0]
    # monotone trend: successive ranks adjacent -> RVN << 2
    assert r["rvn_ratio"] < 0.5
    assert r["z_score"] < -5.0


def test_difference_sign_matches_brockwell_davis(spark):
    import random

    random.seed(42)
    vals = [round(100 + random.gauss(0, 5), 2) for _ in range(100)]
    r = difference_sign_daily(_contig_df(spark, vals)).collect()[0]
    n = len(vals)
    asc = sum(1 for t in range(1, n) if vals[t] > vals[t - 1])
    mean = (n - 1) / 2.0
    var = (n + 1) / 12.0
    assert r["n_days"] == n and r["n_ascents"] == asc
    assert abs(r["expected"] - mean) < 1e-9
    assert abs(r["z_score"] - (asc - mean) / math.sqrt(var)) < 1e-6


def test_difference_sign_monotone_series(spark):
    vals = [float(i) for i in range(50)]
    r = difference_sign_daily(_contig_df(spark, vals)).collect()[0]
    assert r["n_ascents"] == 49
    assert r["z_score"] > 11.0  # every step ascends


# ---- wave 15: seasonal Mann-Kendall, Chatterjee xi ----

from breweries_etl_spark.operators.temporal import (  # noqa: E402
    chatterjee_xi_daily,
    seasonal_mann_kendall,
)


def test_seasonal_mann_kendall_matches_reference(spark):
    import datetime
    import random
    from collections import Counter

    random.seed(51)
    vals = [
        round(
            100 + 0.5 * i + 30 * math.sin(2 * math.pi * (i % 7) / 7)
            + random.gauss(0, 3),
            2,
        )
        for i in range(98)
    ]
    r = seasonal_mann_kendall(_contig_df(spark, vals)).collect()[0]
    base_epoch = (
        datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)
    ).days
    s_ref = 0
    var_ref = 0.0
    for g in range(7):
        ys = [vals[i] for i in range(98) if (base_epoch + i) % 7 == g]
        ng = len(ys)
        for a in range(ng):
            for b in range(a + 1, ng):
                s_ref += (ys[b] > ys[a]) - (ys[b] < ys[a])
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var_ref += (ng * (ng - 1) * (2 * ng + 5) - tie) / 18.0
    z_ref = (
        (s_ref - 1) / math.sqrt(var_ref)
        if s_ref > 0
        else ((s_ref + 1) / math.sqrt(var_ref) if s_ref < 0 else 0.0)
    )
    assert r["n_days"] == 98 and r["n_seasons"] == 7
    assert r["s_stat"] == s_ref
    assert abs(r["var_s"] - var_ref) < 1e-4
    assert abs(r["z_score"] - z_ref) < 1e-5
    # trend detected despite the strong weekly rhythm
    assert r["z_score"] > 3.0


def test_seasonal_mk_pure_rhythm_is_null(spark):
    # pure weekly pattern, NO trend: within-season series are flat ->
    # S = 0 and z = 0
    vals = [
        100.0 + 30 * math.sin(2 * math.pi * (i % 7) / 7)
        for i in range(70)
    ]
    r = seasonal_mann_kendall(_contig_df(spark, vals)).collect()[0]
    assert r["s_stat"] == 0
    # every within-season series is CONSTANT, so the tie correction
    # zeroes the variance and z is NULL (guarded), not 0
    assert r["var_s"] == 0.0
    assert r["z_score"] is None


def test_chatterjee_xi_functional_dependence(spark):
    import datetime

    rows = []
    for i in range(80):
        cnt = 5 + (i % 17)
        total = round(100 * math.sin(cnt / 3.0) ** 2 + 10, 2)
        per = round(total / cnt, 6)
        stamp = (
            datetime.datetime(2024, 1, 1, 10)
            + datetime.timedelta(days=i)
        ).strftime("%Y-%m-%d %H:%M:%S")
        rows += [(stamp, per)] * cnt
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    r = chatterjee_xi_daily(df).collect()[0]
    # y is a (non-monotone) function of x: xi should be high while
    # a LINEAR correlation would miss the sin^2 shape
    assert r["n_days"] == 80
    assert r["xi"] > 0.5


def test_chatterjee_xi_independence_near_zero(spark):
    import datetime
    import random

    random.seed(53)
    rows = []
    for i in range(120):
        cnt = 5 + random.randrange(20)
        per = round(random.uniform(1, 20), 2)
        stamp = (
            datetime.datetime(2024, 1, 1, 10)
            + datetime.timedelta(days=i)
        ).strftime("%Y-%m-%d %H:%M:%S")
        rows += [(stamp, per)] * cnt
    df = spark.createDataFrame(rows, ["ts", "value"]).select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    r = chatterjee_xi_daily(df).collect()[0]
    assert abs(r["xi"]) < 0.3  # independent: xi ~ 0 (O(1/sqrt(n)))


# ---- wave 16: Wilson CIs, cluster-jackknife ratio ----

from breweries_etl_spark.operators.profiling import (  # noqa: E402
    jackknife_ratio_by_group,
    wilson_ci_by_group,
)

_WILSON_Z = 1.959963984540054


def test_wilson_ci_matches_formula(spark):
    rows = (
        [("a", 1)] * 8 + [("a", 0)] * 2
        + [("b", 1)] * 1 + [("b", 0)] * 19
    )
    df = spark.createDataFrame(rows, ["g", "s"])
    out = {
        r["group"]: r
        for r in wilson_ci_by_group(df, "g", F.col("s") == 1).collect()
    }
    for g, n, k in (("a", 10, 8), ("b", 20, 1)):
        p = k / n
        z2 = _WILSON_Z * _WILSON_Z
        den = 1 + z2 / n
        c = (p + z2 / (2 * n)) / den
        h = (
            _WILSON_Z
            * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
            / den
        )
        r = out[g]
        assert r["n"] == n and r["successes"] == k
        assert abs(r["ci_low"] - (c - h)) < 1e-6
        assert abs(r["ci_high"] - (c + h)) < 1e-6
        # Wilson never leaves [0, 1] — the Wald interval does here
        assert 0.0 <= r["ci_low"] < r["ci_high"] <= 1.0


def test_wilson_beats_wald_at_extreme_p(spark):
    # all successes: Wald width is 0 (useless); Wilson is positive
    df = spark.createDataFrame([("a", 1)] * 15, ["g", "s"])
    r = wilson_ci_by_group(df, "g", F.col("s") == 1).collect()[0]
    assert r["p_hat"] == 1.0
    assert r["ci_low"] < 1.0  # informative lower bound
    assert r["ci_high"] == 1.0


def test_jackknife_ratio_matches_reference(spark):
    import random
    from collections import defaultdict

    random.seed(61)
    data = []
    for g in range(12):
        for _ in range(random.randrange(5, 30)):
            data.append((f"g{g}", round(random.uniform(10, 200), 2)))
    df = spark.createDataFrame(data, ["g", "x"])
    r = jackknife_ratio_by_group(df, "g", "x").collect()[0]
    xs = defaultdict(float)
    ns = defaultdict(int)
    for g, x in data:
        xs[g] += x
        ns[g] += 1
    big_g = len(xs)
    xx = sum(xs.values())
    nn = sum(ns.values())
    theta = xx / nn
    loos = [(xx - xs[g]) / (nn - ns[g]) for g in xs]
    tb = sum(loos) / big_g
    se = math.sqrt(
        (big_g - 1) / big_g * sum((t - tb) ** 2 for t in loos)
    )
    bias = (big_g - 1) * (tb - theta)
    assert r["n_groups"] == big_g
    assert abs(r["ratio"] - theta) < 1e-6
    assert abs(r["jackknife_se"] - se) < 1e-5
    assert abs(r["jackknife_bias"] - bias) < 1e-5


def test_jackknife_se_exceeds_iid_under_clustering(spark):
    # strong between-group level differences: cluster jackknife SE
    # must exceed the naive iid SE of the mean
    import random

    random.seed(62)
    data = []
    for g in range(10):
        mu = 50 + 15 * g
        for _ in range(20):
            data.append((f"g{g}", round(mu + random.gauss(0, 1), 2)))
    df = spark.createDataFrame(data, ["g", "x"])
    r = jackknife_ratio_by_group(df, "g", "x").collect()[0]
    vals = [x for _, x in data]
    n = len(vals)
    m = sum(vals) / n
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (n - 1))
    iid_se = sd / math.sqrt(n)
    assert r["jackknife_se"] > 0.9 * iid_se  # near/above even here


# ---- wave 17: log-rank retention test ----

from breweries_etl_spark.operators.behavior import logrank_retention  # noqa: E402


def _logrank_reference(recs):
    """recs: (lifetime_day, churn, grp) tuples."""
    days = sorted({d for d, _, _ in recs})
    o1 = sum(c for _, c, g in recs if g == 1)
    e1 = 0.0
    v = 0.0
    for t in days:
        dt = sum(c for d, c, _ in recs if d == t)
        if dt == 0:
            continue
        n1 = sum(1 for d, _, g in recs if d >= t and g == 1)
        ntot = sum(1 for d, _, _ in recs if d >= t)
        e1 += dt * n1 / ntot
        if ntot > 1:
            v += (
                dt * (n1 / ntot) * (1 - n1 / ntot)
                * (ntot - dt) / (ntot - 1)
            )
    return o1, e1, (o1 - e1) ** 2 / v


def _retention_fixture(spark, engaged_scale, casual_scale, seed=71):
    """Events carry DISTINCT HOUR slots so the per-user event count is
    fixed by cohort regardless of lifetime (short-lived engaged users
    must not leak into the casual cohort — that selection bias fakes a
    survival difference even under identical lifetime laws)."""
    import datetime
    import random

    random.seed(seed)
    rows = []
    base = datetime.datetime(2024, 1, 1)
    for u in range(200):
        engaged = u % 2 == 0
        scale = engaged_scale if engaged else casual_scale
        life = min(int(random.expovariate(1 / scale)), 55)
        n_ev = 8 if engaged else 3
        start = random.randrange(0, 4)
        stamps = [(start, 1), (start + life, 2)]
        for h in range(3, n_ev + 1):
            stamps.append((start + random.randrange(0, life + 1), h))
        for d, h in stamps:
            rows.append(
                (
                    u,
                    (
                        base + datetime.timedelta(days=d, hours=h)
                    ).strftime("%Y-%m-%d %H:%M:%S"),
                )
            )
    return rows, spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )


def test_logrank_matches_reference(spark):
    import datetime
    from collections import defaultdict

    rows, df = _retention_fixture(spark, 18, 7)
    r = logrank_retention(df, min_events=5).collect()[0]
    per_user = defaultdict(lambda: [None, None, 0])
    for u, ts in rows:
        d = datetime.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        pu = per_user[u]
        pu[0] = d if pu[0] is None or d < pu[0] else pu[0]
        pu[1] = d if pu[1] is None or d > pu[1] else pu[1]
        pu[2] += 1
    max_last = max(p[1] for p in per_user.values())
    recs = [
        (
            (l - f).days,
            1 if l < max_last - datetime.timedelta(days=7) else 0,
            1 if n >= 5 else 0,
        )
        for f, l, n in per_user.values()
    ]
    o1, e1, chi2 = _logrank_reference(recs)
    assert r["observed_a"] == o1
    assert abs(r["expected_a"] - e1) < 1e-4
    assert abs(r["chi2"] - chi2) < 1e-3
    # engaged cohort survives longer: strong rejection
    assert r["chi2"] > 3.84


def test_logrank_identical_cohorts_accepts(spark):
    _, df = _retention_fixture(spark, 10, 10, seed=72)
    r = logrank_retention(df, min_events=5).collect()[0]
    # same lifetime distribution in both cohorts: chi2 below the 1%
    # critical value 6.63 for df=1
    assert r["chi2"] < 6.63
