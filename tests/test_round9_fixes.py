"""Round-9 ADVICE fixes: jonckheere_terpstra unlisted-group moments,
hill_tail_index small-n single-row guarantee, ranking_stability
both-tied pairs scoring zero."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from breweries_etl_spark.operators.hypotests import jonckheere_terpstra
from breweries_etl_spark.operators.profiling import (
    hill_tail_index,
    ranking_stability,
)


def _jt_reference(groups):
    """Independent JT reference: U-sum over ordered pairs + classical
    null moments restricted to the listed groups."""
    jt = 0.0
    names = list(groups)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            for x in groups[names[i]]:
                for y in groups[names[j]]:
                    jt += 1.0 if x < y else (0.5 if x == y else 0.0)
    sizes = [len(v) for v in groups.values()]
    n = sum(sizes)
    sn2 = sum(s * s for s in sizes)
    sn23 = sum(s * s * (2 * s + 3) for s in sizes)
    mean = (n * n - sn2) / 4.0
    var = (n * n * (2 * n + 3) - sn23) / 72.0
    return jt, (jt - mean) / math.sqrt(var)


def test_jonckheere_ignores_unlisted_group(spark):
    """ADVICE r9 #1: a group present in df but absent from
    ordered_groups must not enter n/k or the null moments E/Var.
    Before the fix, adding an unlisted group flipped the z sign."""
    listed = {
        "a": [1.0, 2.0, 3.0, 4.0],
        "b": [3.0, 4.0, 5.0, 6.0],
        "c": [5.0, 6.0, 7.0, 8.0],
    }
    rows = [(g, v) for g, vs in listed.items() for v in vs]
    df_clean = spark.createDataFrame(rows, ["g", "v"])
    # same data plus a big unlisted group 'z'
    noisy = rows + [("z", float(v)) for v in range(100, 140)]
    df_noisy = spark.createDataFrame(noisy, ["g", "v"])

    out_clean = jonckheere_terpstra(df_clean, "g", "v", ["a", "b", "c"])
    out_noisy = jonckheere_terpstra(df_noisy, "g", "v", ["a", "b", "c"])
    r1, r2 = out_clean.collect()[0], out_noisy.collect()[0]
    assert r1 == r2, "unlisted group leaked into the statistic"
    jt_ref, z_ref = _jt_reference(listed)
    assert r1["n"] == 12 and r1["k_groups"] == 3
    assert abs(float(r1["jt_stat"]) - jt_ref) < 1e-6
    assert abs(float(r1["z_score"]) - z_ref) < 1e-5


def test_hill_tail_index_small_n_single_row(spark):
    """ADVICE r9 #2: with positive-value count <= k there is no rank
    k+1 order statistic; the operator must still emit its documented
    single row (NULL x_k1 / hill_alpha), not zero rows."""
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], ["x"])
    rows = hill_tail_index(df, "x", k=100).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == 5 and r["k"] == 100
    assert r["x_k1"] is None and r["hill_alpha"] is None


def test_hill_tail_index_normal_path_unchanged(spark):
    """Sanity: the n > k path still matches the closed form."""
    vals = [float(i) for i in range(1, 21)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    r = hill_tail_index(df, "x", k=5).collect()[0]
    top5 = sorted(vals, reverse=True)[:5]
    xk1 = sorted(vals, reverse=True)[5]
    ls = sum(round(math.log(x / xk1), 6) for x in top5)
    assert r["n"] == 20 and abs(float(r["x_k1"]) - xk1) < 1e-9
    assert abs(float(r["hill_alpha"]) - 5.0 / ls) < 1e-5


def test_ranking_stability_both_tied_pairs_score_zero(spark):
    """ADVICE r9 #3: a pair tied in BOTH metrics is full agreement
    (penalty 0), not half-discordant. Fixture: two keys identical in
    both metrics, one key strictly above — tau must be exactly 1."""
    df = spark.createDataFrame(
        [("k1", 10, 5), ("k2", 10, 5), ("k3", 20, 9)],
        ["key", "m1", "m2"],
    )
    r = ranking_stability(
        df,
        "key",
        F.sum(F.col("m1").cast("decimal(38,2)")),
        F.sum(F.col("m2").cast("decimal(38,2)")),
    ).collect()[0]
    assert r["n_keys"] == 3
    assert r["n_discordant2"] == 0, "both-tied pair was penalized"
    assert abs(float(r["kendall_tau"]) - 1.0) < 1e-9


def test_ranking_stability_single_tie_still_half(spark):
    """The exactly-one-metric tie keeps its half-discordance: keys
    tied on m1 but ordered on m2 -> d2 = 1."""
    df = spark.createDataFrame(
        [("k1", 10, 5), ("k2", 10, 9)], ["key", "m1", "m2"]
    )
    r = ranking_stability(
        df,
        "key",
        F.sum(F.col("m1").cast("decimal(38,2)")),
        F.sum(F.col("m2").cast("decimal(38,2)")),
    ).collect()[0]
    assert r["n_discordant2"] == 1


def test_wasserstein_single_distinct_value_keeps_counts(spark):
    """Self-audit r9: with < 2 distinct values the segment relation is
    empty; the operator must still report (n_a, n_b, 0.0), not a row
    of NULLs (the hill_tail_index empty-relation class)."""
    from breweries_etl_spark.operators.hypotests import wasserstein_1

    df = spark.createDataFrame(
        [(5.0, "a")] * 3 + [(5.0, "b")] * 2, ["v", "g"]
    )
    r = wasserstein_1(df, "v", F.col("g") == "a").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert float(r["wasserstein_1"]) == 0.0


def test_kendalls_w_null_metric_keys_dropped(spark):
    """Self-audit r9: a key whose metric aggregate is NULL must be
    listwise-dropped before ranking (Spark sorts NULLs first, DuckDB
    last — silent engine divergence otherwise)."""
    from breweries_etl_spark.operators.profiling import kendalls_w

    df = spark.createDataFrame(
        [("k1", 1.0, 1.0), ("k2", 2.0, 2.0), ("k3", None, 3.0)],
        ["k", "a", "b"],
    )
    r = kendalls_w(df, "k", [F.max("a"), F.max("b")]).collect()[0]
    assert r["n_keys"] == 2


def test_hoeffding_d_loud_cell_cap(spark):
    """ADVICE r9 open item closed: a near-continuous column must fail
    LOUDLY (the placement join is quadratic in n_cells), never run an
    accidental cross join."""
    from breweries_etl_spark.operators.hypotests import hoeffding_d

    df = spark.createDataFrame(
        [(float(i), float(i * 7 % 13)) for i in range(50)], ["x", "y"]
    )
    with pytest.raises(ValueError, match="max_cells"):
        hoeffding_d(df, "x", "y", max_cells=10)
    # raising the cap deliberately works
    assert hoeffding_d(df, "x", "y", max_cells=100).count() == 1
