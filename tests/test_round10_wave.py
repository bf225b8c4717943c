"""Round-10 wave 18: Lepage omnibus, Pettitt change-point,
Foster-Stuart records — each pinned against an independent hand-rolled
Python reference computed at test-writing time."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from breweries_etl_spark.operators.hypotests import lepage_test
from breweries_etl_spark.operators.temporal import (
    foster_stuart_records,
    pettitt_changepoint,
)


def _daily_df(spark, ys):
    rows = [(i, float(v)) for i, v in enumerate(ys)]
    return spark.createDataFrame(rows, "d long, value double").select(
        F.timestamp_seconds(F.col("d") * 86400).alias("ts"), "value"
    )


def test_lepage_matches_reference(spark):
    """Reference: midranks + tie-corrected Wilcoxon variance +
    Hollander-Wolfe AB moments, computed independently (pair loops)."""
    a = [1.0, 2.0, 2.0, 5.0, 7.0, 9.0, 9.0]
    b = [3.0, 3.0, 4.0, 6.0, 6.0, 8.0, 10.0, 12.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = lepage_test(df, "v", F.col("g") == "A").collect()[0]
    assert (r["n_a"], r["n_b"]) == (7, 8)
    assert float(r["z_wilcoxon"]) == -0.929144
    assert float(r["z_ansari"]) == -0.901857
    assert float(r["lepage_l"]) == 1.676656
    assert float(r["p_value"]) == 0.432433


def test_lepage_identity_with_components(spark):
    """L must equal z_w^2 + z_ab^2 of its own emitted components."""
    rows = [("A", float(v)) for v in range(1, 30)] + [
        ("B", float(v) * 2) for v in range(1, 25)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = lepage_test(df, "v", F.col("g") == "A").collect()[0]
    zw, zab = float(r["z_wilcoxon"]), float(r["z_ansari"])
    assert abs(float(r["lepage_l"]) - (zw * zw + zab * zab)) < 1e-4
    assert abs(
        float(r["p_value"]) - math.exp(-float(r["lepage_l"]) / 2)
    ) < 1e-5


def test_pettitt_matches_reference(spark):
    """Reference: brute-force U_t = sum_{i<=t, j>t} sgn(y_i - y_j)
    over all prefix splits (O(n^2) loops)."""
    ys = [5.0, 7.0, 6.0, 8.0, 20.0, 22.0, 21.0, 25.0, 24.0, 30.0]
    r = pettitt_changepoint(_daily_df(spark, ys)).collect()[0]
    assert r["n_days"] == 10
    assert r["k_stat"] == 25  # brute force max |U_t|
    assert r["change_day"] == 4  # argmax split after the 5th day
    assert float(r["p_approx"]) == 0.066143


def test_pettitt_empty_and_single_row_guarantee(spark):
    """Empty / 1-day input must yield ONE row with NULL stats, not zero
    rows (the wasserstein annihilation class)."""
    empty = _daily_df(spark, []).filter(F.lit(False))
    r = pettitt_changepoint(empty).collect()
    assert len(r) == 1 and r[0]["n_days"] == 0
    one = pettitt_changepoint(_daily_df(spark, [5.0])).collect()
    assert len(one) == 1 and one[0]["n_days"] == 1
    assert one[0]["p_approx"] is None


def test_foster_stuart_matches_reference(spark):
    ys = [5.0, 7.0, 6.0, 8.0, 20.0, 22.0, 21.0, 25.0, 24.0, 30.0]
    r = foster_stuart_records(_daily_df(spark, ys)).collect()[0]
    assert (r["n_upper"], r["n_lower"]) == (6, 0)
    assert (r["d_stat"], r["s_stat"]) == (6, 6)
    assert float(r["z_trend"]) == 3.054736
    assert float(r["z_disp"]) == 1.663132


def test_foster_stuart_monotone_down_is_all_lower_records(spark):
    ys = [10.0, 9.0, 8.0, 7.0, 6.0]
    r = foster_stuart_records(_daily_df(spark, ys)).collect()[0]
    assert (r["n_upper"], r["n_lower"]) == (0, 4)
    assert r["d_stat"] == -4
    assert float(r["z_trend"]) < -2.0


def test_fleiss_kappa_matches_reference(spark):
    """Reference: explicit n_ij matrix Fleiss computation (P_i terms)."""
    from breweries_etl_spark.operators.profiling import fleiss_kappa_binary

    nps = [3, 2, 1, 0, 3, 3, 2]
    rows = [(p >= 1, p >= 2, p >= 3) for p in nps]
    df = spark.createDataFrame(rows, "a boolean, b boolean, c boolean")
    r = fleiss_kappa_binary(
        df, [F.col("a"), F.col("b"), F.col("c")]
    ).collect()[0]
    assert r["n_subjects"] == 7 and r["m_raters"] == 3
    assert float(r["p_pass"]) == 0.666667
    assert float(r["p_bar"]) == 0.714286
    assert float(r["p_e"]) == 0.555556
    assert float(r["fleiss_kappa"]) == 0.357143


def test_fleiss_kappa_null_rater_votes_fail(spark):
    """A NULL rater expression votes FAIL (CASE-ELSE convention), so
    all-NULL rows agree perfectly with all-false rows."""
    from breweries_etl_spark.operators.profiling import fleiss_kappa_binary

    df_null = spark.createDataFrame(
        [(None, None), (True, True)], "a boolean, b boolean"
    )
    df_false = spark.createDataFrame(
        [(False, False), (True, True)], "a boolean, b boolean"
    )
    r1 = fleiss_kappa_binary(df_null, [F.col("a"), F.col("b")]).collect()
    r2 = fleiss_kappa_binary(df_false, [F.col("a"), F.col("b")]).collect()
    assert r1 == r2


def test_dagostino_matches_reference(spark):
    """Reference: the full D'Agostino 1970 + Anscombe-Glynn 1983 chain
    in plain Python over the same quantized values — with the CORRECT
    Anscombe-Glynn centering x = (g2 + 6/(n+1))/sqrt(var b2) (round-10
    shipped g2 − E[b2], an extra −3 shift; ADVICE r10 high).  Fixture
    scaled ×1000 into the price-magnitude regime where the cent/2²⁰
    quantization resolves the 4th moment (the original ~20-to-80-range
    fixture put floor(w⁴·1e16) at quantization noise).  Lognormal is
    strongly non-normal: BOTH z's large POSITIVE (heavy right tail ⇒
    b2 ≫ 3; the buggy formula could flip z_kurt's meaning)."""
    import math
    import random

    from breweries_etl_spark.operators.hypotests import dagostino_k2

    random.seed(7)
    xs = [round(random.lognormvariate(3, 0.8), 2) * 1000.0 for _ in range(200)]
    df = spark.createDataFrame([(float(v),) for v in xs], "v double")
    r = dagostino_k2(df, "v").collect()[0]
    assert r["n"] == 200
    assert float(r["z_skew"]) == 9.611981
    assert float(r["z_kurt"]) == 6.889155
    assert float(r["k2_stat"]) == 139.850643
    assert float(r["p_value"]) == 0.0
    assert math.isfinite(float(r["z_kurt"]))


def test_dagostino_near_normal_z_kurt_small(spark):
    """The exact ADVICE r10 failure probe: on near-normal data the
    buggy centering produced z_kurt ≈ +38 (a −3/√v2 shift blows up
    with n); the corrected transform must leave |z_kurt| < 3."""
    import random

    from breweries_etl_spark.operators.hypotests import dagostino_k2

    random.seed(11)
    xs = [round(random.gauss(100000, 15000), 2) for _ in range(500)]
    df = spark.createDataFrame([(float(v),) for v in xs], "v double")
    r = dagostino_k2(df, "v").collect()[0]
    assert r["n"] == 500
    assert abs(float(r["z_kurt"])) < 3.0
    assert float(r["z_kurt"]) == 0.852173
    assert float(r["z_skew"]) == 1.911786


def test_dagostino_small_n_is_null(spark):
    from breweries_etl_spark.operators.hypotests import dagostino_k2

    df = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    r = dagostino_k2(df, "v").collect()[0]
    assert r["n"] == 10
    assert r["z_skew"] is None and r["k2_stat"] is None


def test_permutation_entropy_matches_reference(spark):
    from breweries_etl_spark.operators.temporal import (
        permutation_entropy_daily,
    )

    ys = [5.0, 7.0, 6.0, 8.0, 20.0, 22.0, 21.0, 25.0, 24.0, 30.0, 5.0, 5.0, 9.0]
    r = permutation_entropy_daily(_daily_df(spark, ys)).collect()[0]
    assert (r["n_triples"], r["n_patterns"]) == (11, 5)
    assert float(r["perm_entropy"]) == 1.49903
    assert float(r["normalized_pe"]) == 0.836625


def test_permutation_entropy_monotone_is_zero(spark):
    """A strictly increasing series has ONE pattern: entropy exactly 0."""
    from breweries_etl_spark.operators.temporal import (
        permutation_entropy_daily,
    )

    r = permutation_entropy_daily(
        _daily_df(spark, [float(i) for i in range(12)])
    ).collect()[0]
    assert r["n_patterns"] == 1
    assert float(r["perm_entropy"]) == 0.0


def test_variance_ratio_matches_reference(spark):
    """Reference: Lo-MacKinlay VR(5) with overlapping q-increments and
    the unbiased m = q(n-q+1)(1-q/n), plain Python loops."""
    from breweries_etl_spark.operators.temporal import variance_ratio_daily

    ys = [5.0, 7.0, 6.0, 8.0, 20.0, 22.0, 21.0, 25.0, 24.0, 30.0,
          28.0, 31.0, 29.0, 35.0]
    r = variance_ratio_daily(_daily_df(spark, ys)).collect()[0]
    assert (r["n_days"], r["n_returns"]) == (14, 13)
    assert float(r["vr_stat"]) == 0.090771
    assert float(r["z_score"]) == -1.496319


def test_buishand_matches_reference(spark):
    from breweries_etl_spark.operators.temporal import buishand_range_daily

    ys = [5.0, 7.0, 6.0, 8.0, 20.0, 22.0, 21.0, 25.0, 24.0, 30.0,
          28.0, 31.0, 29.0, 35.0]
    r = buishand_range_daily(_daily_df(spark, ys)).collect()[0]
    assert r["n_days"] == 14
    assert float(r["q_stat"]) == 57.928571
    assert float(r["q_scaled"]) == 1.569449
    assert float(r["r_scaled"]) == 1.569449


def test_diversity_indices_uniform_and_skewed(spark):
    """Uniform 4-category mix: H = ln 4, Pielou = 1, Simpson = 0.75,
    Berger-Parker = 0.25. NULL is a real category."""
    import math

    from breweries_etl_spark.operators.corpus import diversity_indices

    uni = spark.createDataFrame(
        [(c,) for c in ["a", "b", "c", None] * 5], "source string"
    )
    r = diversity_indices(uni, "source").collect()[0]
    assert r["n_categories"] == 4
    assert abs(float(r["shannon_h"]) - math.log(4)) < 1e-5
    # per-term round-6 folding can land an ulp above exactly 1
    assert abs(float(r["pielou_j"]) - 1.0) < 1e-5
    assert float(r["simpson_d"]) == 0.75
    assert float(r["berger_parker"]) == 0.25
    skew = spark.createDataFrame(
        [("a",)] * 9 + [("b",)], "source string"
    )
    r2 = diversity_indices(skew, "source").collect()[0]
    assert float(r2["berger_parker"]) == 0.9
    assert float(r2["shannon_h"]) < 0.4
