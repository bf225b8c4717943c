"""Profiling, outlier detection, PII redaction, incremental dedup."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.operators.dedup import dedup_incremental
from breweries_etl_spark.operators.profiling import numeric_outliers, profile_table
from breweries_etl_spark.operators.text import redact_pii


def test_profile_table_metrics(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b="x"), Row(a=None, b="y")],
        "a int, b string",
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert prof["a"]["n_nonnull"] == 2
    assert prof["a"]["n_nulls"] == 1
    assert prof["a"]["n_distinct"] == 2
    assert prof["a"]["min_value"] == "1" and prof["a"]["max_value"] == "2"
    assert prof["b"]["n_distinct"] == 2


def test_numeric_outliers_grouped(spark):
    rows = [Row(g="a", v=float(x)) for x in [10, 11, 9, 10, 11, 9, 10, 100]] + [
        Row(g="b", v=float(x)) for x in [5, 5, 5, 5]
    ]
    df = spark.createDataFrame(rows)
    out = numeric_outliers(df, "v", "g", z=2.0).collect()
    assert [(r["g"], r["v"]) for r in out] == [("a", 100.0)]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="mail me at jo.doe+x@corp.io or call +1 (555) 010-9999 ok")]
    )
    got = redact_pii(df).first()["text"]
    assert got == "mail me at <EMAIL> or call <PHONE> ok"


def test_redact_keeps_clean_text(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="no pii here 42")])
    assert redact_pii(df).first()["text"] == "no pii here 42"


def test_dedup_incremental_matches(spark):
    base = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta"), Row(doc_id=2, text="gamma delta")]
    )
    incoming = spark.createDataFrame(
        [Row(doc_id=10, text="  Alpha   BETA!"),   # dup of 1 after normalize
         Row(doc_id=11, text="brand new content")]
    )
    got = dedup_incremental(base, incoming).collect()
    assert len(got) == 1
    assert got[0]["incoming_id"] == 10 and got[0]["base_id"] == 1


def test_zscore_outliers_exact_flags_planted_outlier(spark):
    from pyspark.sql import Row

    from breweries_etl_spark.operators.profiling import zscore_outliers_exact

    rows = [Row(k=i, g="a", v=100.0) for i in range(20)]
    rows[0] = Row(k=0, g="a", v=100.5)   # tiny jitter so variance > 0
    rows.append(Row(k=99, g="a", v=500.0))  # the outlier
    df = spark.createDataFrame(rows, "k long, g string, v double")
    got = zscore_outliers_exact(df, "v", "k", "g", z=3.0).collect()
    assert [r["k"] for r in got] == [99]
    assert got[0]["zscore"] > 3.0


def test_zscore_outliers_constant_group_emits_nothing(spark):
    from pyspark.sql import Row

    from breweries_etl_spark.operators.profiling import zscore_outliers_exact

    df = spark.createDataFrame(
        [Row(k=i, g="a", v=7.0) for i in range(5)], "k long, g string, v double"
    )
    assert zscore_outliers_exact(df, "v", "k", "g").count() == 0


def test_key_skew_profile_ranks_hot_key(spark):
    from pyspark.sql import Row

    from breweries_etl_spark.operators.profiling import key_skew_profile

    # key 7 carries 10 of 14 rows; keys 1..4 one row each
    rows = [Row(k=7) for _ in range(10)] + [Row(k=i) for i in range(1, 5)]
    out = key_skew_profile(spark.createDataFrame(rows, "k long"), "k", 3).collect()
    assert out[0]["k"] == 7 and out[0]["cnt"] == 10
    assert out[0]["share"] == round(10 / 14, 6)
    # heat = cnt / (total/nkeys) = 10 / (14/5)
    assert out[0]["heat"] == round(10 * 5 / 14, 6)
    assert len(out) == 3
    # ties (cnt=1) break on key ascending
    assert [r["k"] for r in out[1:]] == [1, 2]


def test_equi_width_histogram_counts_and_edges(spark):
    from pyspark.sql import Row

    from breweries_etl_spark.operators.profiling import equi_width_histogram

    df = spark.createDataFrame([Row(v=float(x)) for x in range(0, 101)])
    out = {r["bucket"]: r for r in equi_width_histogram(df, "v", 4).collect()}
    # 0..100 over 4 buckets of width 25; v=100 folds into bucket 4
    assert [out[b]["cnt"] for b in (1, 2, 3, 4)] == [25, 25, 25, 26]
    assert out[1]["lo"] == 0.0 and out[4]["hi"] == 100.0


def test_equi_width_histogram_constant_column(spark):
    from pyspark.sql import Row

    from breweries_etl_spark.operators.profiling import equi_width_histogram

    df = spark.createDataFrame([Row(v=5.0)] * 7)
    out = equi_width_histogram(df, "v", 10).collect()
    assert len(out) == 1 and out[0]["bucket"] == 1 and out[0]["cnt"] == 7


def test_distribution_shift_identical_slices_zero(spark):
    from breweries_etl_spark.operators.profiling import distribution_shift

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(40)], "id long, lang string"
    )
    out = distribution_shift(df, df, "lang").collect()
    assert len(out) == 2
    for r in out:
        assert float(r["kl_term"]) == 0.0 and float(r["tv_term"]) == 0.0
        assert float(r["total_kl"]) == 0.0 and float(r["total_tv"]) == 0.0


def test_distribution_shift_detects_missing_category(spark):
    from breweries_etl_spark.operators.profiling import distribution_shift

    a = spark.createDataFrame([(i, "en") for i in range(50)], "id long, lang string")
    b = spark.createDataFrame(
        [(i, "en" if i < 25 else "de") for i in range(50)], "id long, lang string"
    )
    rows = {r["lang"]: r for r in distribution_shift(a, b, "lang").collect()}
    assert set(rows) == {"en", "de"}
    assert rows["de"]["n_a"] == 0 and rows["de"]["n_b"] == 25
    assert float(rows["en"]["total_kl"]) > 0.3  # en mass halved -> big KL
    # TV distance ~ (|0.98-0.5| + |0.02-0.5|)/2 ~ 0.48 with smoothing
    assert 0.4 < float(rows["en"]["total_tv"]) < 0.5


def test_categorical_entropy_uniform_and_constant(spark):
    import math

    from breweries_etl_spark.operators.profiling import categorical_entropy

    df = spark.createDataFrame(
        [(("a" if i % 2 else "b"), "const", None) for i in range(64)],
        "fair string, constant string, always_null string",
    )
    rows = {
        r["col_name"]: r
        for r in categorical_entropy(
            df, ["fair", "constant", "always_null"]
        ).collect()
    }
    assert abs(float(rows["fair"]["entropy_bits"]) - 1.0) < 1e-6
    assert float(rows["constant"]["entropy_bits"]) == 0.0
    assert float(rows["always_null"]["entropy_bits"]) == 0.0  # NULL = one class
    assert rows["fair"]["n_distinct"] == 2
    assert rows["always_null"]["n_distinct"] == 1


def test_join_size_estimate_matches_actual_join(spark):
    from breweries_etl_spark.operators.profiling import join_size_estimate

    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(1,), (1,), (1,), (3,), (9,)], "j long")
    r = join_size_estimate(a, b, "k", "j").collect()[0]
    actual = a.join(b, a["k"] == b["j"]).count()
    assert r["n_join_rows"] == actual == 7  # 2*3 + 1*1
    assert r["n_matching_keys"] == 2 and r["max_key_rows"] == 6
    assert r["n_left"] == 4 and r["n_right"] == 5


def test_embedding_norm_stats_unit_vectors(spark):
    from breweries_etl_spark.operators.profiling import embedding_norm_stats

    # two opposite unit vectors: mean vector = 0 -> anisotropy-free
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = embedding_norm_stats(df).collect()[0]
    assert r["n_vectors"] == 2 and r["dim"] == 2
    assert float(r["mean_norm"]) == 1.0
    assert float(r["mean_vector_norm"]) == 0.0
    # identical vectors: mean-vector norm == mean norm (full collapse)
    df2 = spark.createDataFrame(
        [(1, [0.6, 0.8]), (2, [0.6, 0.8])], "vec_id long, embedding array<float>"
    )
    r2 = embedding_norm_stats(df2).collect()[0]
    assert abs(float(r2["mean_vector_norm"]) - float(r2["mean_norm"])) < 1e-5
