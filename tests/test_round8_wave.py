"""Round-8 wave: independent small-fixture checks for the new
operators (the oracle sweep covers engine-vs-DuckDB parity; these pin
the MATH against hand-computed references)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_jonckheere_known_ordered_sample(spark):
    """Textbook JT: groups g1=[1,2], g2=[3,4], g3=[5,6] perfectly
    ordered -> JT = sum of all cross-pair counts = 3 pairs * 4 = 12
    (every low-group value below every high-group value)."""
    from breweries_etl_spark.operators.hypotests import jonckheere_terpstra

    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
            ("c", 5.0), ("c", 6.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = jonckheere_terpstra(df, "g", "v", ["a", "b", "c"]).collect()[0]
    assert out["jt_stat"] == 12.0
    assert out["n"] == 6 and out["k_groups"] == 3
    # E = (36 - 12)/4 = 6; Var = (36*15 - 3*4*7)/72 = 6.333...
    assert abs(out["z_score"] - (12 - 6) / math.sqrt((36 * 15 - 84) / 72)) < 1e-5


def test_dunn_mean_ranks_sum_identity(spark):
    """Mean ranks weighted by group sizes must average to (N+1)/2."""
    from breweries_etl_spark.operators.hypotests import dunn_pairwise_z

    rows = [("a", v) for v in [1.0, 5.0, 9.0]] + [
        ("b", v) for v in [2.0, 5.0, 8.0]
    ] + [("c", v) for v in [3.0, 5.0, 7.0]]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = dunn_pairwise_z(df, "g", "v").collect()
    assert len(out) == 3
    # reconstruct weighted mean of mean-ranks over the pair rows
    seen = {}
    for r in out:
        seen[r["group_a"]] = (r["n_a"], r["mean_rank_a"])
        seen[r["group_b"]] = (r["n_b"], r["mean_rank_b"])
    n = sum(v[0] for v in seen.values())
    wavg = sum(v[0] * v[1] for v in seen.values()) / n
    assert abs(wavg - (n + 1) / 2) < 1e-6


def test_hodges_lehmann_exact_shift(spark):
    """Pure shift fixture: B = A + 3 -> HL estimator exactly 3."""
    from breweries_etl_spark.operators.hypotests import hodges_lehmann_shift

    a = [1.0, 2.0, 3.0, 4.0]
    rows = [(v + 3, True) for v in a] + [(v, False) for v in a]
    df = spark.createDataFrame(rows, ["v", "in_a"])
    out = hodges_lehmann_shift(df, "v", F.col("in_a")).collect()[0]
    assert out["hl_shift"] == 3.0


def test_lin_ccc_perfect_agreement(spark):
    """y = x gives CCC = 1 and zero shifts."""
    from breweries_etl_spark.operators.hypotests import lin_ccc

    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(1, 21)], ["x", "y"]
    )
    out = lin_ccc(df, "x", "y").collect()[0]
    assert out["ccc"] == 1.0 and out["pearson_r"] == 1.0
    assert out["scale_shift"] == 1.0 and out["location_shift"] == 0.0


def test_page_trend_perfect_order(spark):
    """va < vb < vc in every block -> L = n*(1*1 + 2*2 + 3*3) = 14n,
    z = (14n - 12n)/sqrt(2n) = sqrt(2n)."""
    from breweries_etl_spark.operators.hypotests import page_trend_3

    df = spark.createDataFrame(
        [(b, 1.0, 2.0, 3.0) for b in range(8)], ["blk", "a", "b", "c"]
    )
    out = page_trend_3(
        df, "blk", F.col("a"), F.col("b"), F.col("c")
    ).collect()[0]
    assert out["page_l"] == 14.0 * 8
    assert abs(out["z_score"] - math.sqrt(16.0)) < 1e-6


def test_hellinger_identical_groups_zero(spark):
    """The same distribution in both groups -> BC = 1, H = 0."""
    from breweries_etl_spark.operators.hypotests import hellinger_bhattacharyya

    rows = [(float(i % 50), (i // 50) % 2 == 0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["v", "in_a"])
    out = hellinger_bhattacharyya(df, "v", F.col("in_a")).collect()[0]
    assert out["bhattacharyya"] == 1.0
    assert out["hellinger"] == 0.0


def test_group_deviance_perfect_predictor_zero(spark):
    """Constant value within each group -> both deviances 0."""
    from breweries_etl_spark.operators.hypotests import group_deviance

    rows = [("a", 10.0)] * 5 + [("b", 20.0)] * 5
    df = spark.createDataFrame(rows, ["g", "v"])
    out = group_deviance(df, "g", "v").collect()[0]
    assert out["poisson_deviance"] == 0.0
    assert out["gamma_deviance"] == 0.0


def test_degree_centralization_star_is_one(spark):
    """A perfect star graph has Freeman centralization exactly 1."""
    from breweries_etl_spark.operators.graph import degree_centralization

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], ["src", "dst"]
    )
    out = degree_centralization(df, "src", "dst").collect()[0]
    assert out["centralization"] == 1.0
    assert out["max_degree"] == 7
    assert out["wedge_count"] == 21  # C(7,2) at the hub


def test_burstiness_periodic_is_negative_one(spark):
    """Perfectly periodic gaps -> sd = 0 -> B = (0-mu)/(0+mu) = -1."""
    from datetime import datetime, timedelta

    from breweries_etl_spark.operators.temporal import interarrival_burstiness

    base = datetime(2024, 1, 1)
    rows = [(1, base + timedelta(minutes=5 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = interarrival_burstiness(df).collect()[0]
    assert out["n_users"] == 1
    assert out["mean_burstiness"] == -1.0
    assert out["share_bursty"] == 0.0


def test_last_digit_uniform_fixture(spark):
    """An exactly uniform last-digit sample -> chi2 = 0."""
    from breweries_etl_spark.operators.quality import last_digit_uniformity

    rows = [(float(100 + d) / 100.0,) for d in range(10)] * 7
    df = spark.createDataFrame(rows, ["v"])
    out = last_digit_uniformity(df, "v").collect()[0]
    assert out["chi2"] == 0.0
    assert out["n_digits_seen"] == 10


def test_heaps_law_pure_powerlaw_recovered(spark):
    """Synthetic corpus whose vocabulary genuinely grows -> beta in
    (0, 1) and r2 high; exact saturation (every term in chunk 0) ->
    beta ~ 0."""
    from breweries_etl_spark.operators.text import heaps_law_fit

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = heaps_law_fit(df).collect()[0]
    assert 0.5 < out["heaps_beta"] <= 1.05
    assert out["r2"] > 0.99
