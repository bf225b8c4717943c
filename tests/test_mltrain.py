"""Distributed logistic-regression training: learning signal,
determinism under repartitioning, and degenerate inputs."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from breweries_etl_spark.operators.mltrain import (
    hashed_bucket_expr,
    train_logreg_hashed,
)


def _toy(spark, n=60):
    # class 1 docs always contain "alpha beta"; class 0 "gamma delta"
    rows = [
        Row(doc_id=i, text=f"alpha beta filler{i % 7}", lang="en")
        for i in range(n // 2)
    ] + [
        Row(doc_id=1000 + i, text=f"gamma delta filler{i % 7}", lang="de")
        for i in range(n // 2)
    ]
    return spark.createDataFrame(rows)


def test_logreg_learns_separable_classes(spark):
    df = _toy(spark)
    model = train_logreg_hashed(df, F.col("lang") == "en", iterations=8)
    w = {r["dim"]: r["weight"] for r in model.collect()}
    assert len(w) == 33 and -1 in w
    # positive-class tokens must get positive weight, negative negative
    def bucket(tok):
        return spark.range(1).select(
            hashed_bucket_expr(F.lit(tok), 32).alias("b")
        ).collect()[0]["b"]

    assert w[bucket("alpha")] > 0.1
    assert w[bucket("gamma")] < -0.1


def test_logreg_deterministic_under_repartition(spark):
    df = _toy(spark)
    a = sorted(map(tuple, train_logreg_hashed(df, F.col("lang") == "en").collect()))
    b = sorted(
        map(
            tuple,
            train_logreg_hashed(df.repartition(13), F.col("lang") == "en").collect(),
        )
    )
    assert a == b


def test_logreg_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string, lang string")
    model = train_logreg_hashed(df, F.col("lang") == "en")
    rows = model.collect()
    assert len(rows) == 33 and all(r["weight"] == 0.0 for r in rows)


def test_kmeans_exact_deterministic_and_moves_centroids(spark, sf_dir):
    from breweries_etl_spark.operators.mltrain import kmeans_train_exact

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(map(tuple, kmeans_train_exact(emb).collect()))
    b = sorted(map(tuple, kmeans_train_exact(emb.repartition(9)).collect()))
    assert a == b and len(a) == 8 * 64
    # training moved at least some centroids off their seed vectors
    seeds = sorted(map(tuple, kmeans_train_exact(emb, iterations=0).collect()))
    assert a != seeds


def test_kmeans_exact_empty_input(spark):
    from breweries_etl_spark.operators.mltrain import kmeans_train_exact

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_train_exact(emb).count() == 0


def test_naive_bayes_counts_and_smoothing(spark):
    import math

    from breweries_etl_spark.operators.mltrain import train_naive_bayes

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="cat cat dog", lang="en"),
            Row(doc_id=2, text="chat chien", lang="fr"),
        ]
    )
    rows = {(r["label"], r["tok"]): r for r in train_naive_bayes(df).collect()}
    assert rows[("en", "cat")]["c"] == 2
    # V = 4 (cat dog chat chien); en total = 3
    expected = math.floor(math.log(3 / 7) * 1_000_000)
    assert rows[("en", "cat")]["logprob_micro"] == expected
    assert ("en", "chat") not in rows


def test_pca_top_component_matches_numpy(spark):
    """Planted anisotropic cloud: eigenvalue/trace from the replayed
    power iteration must land within rounding noise of numpy's exact
    eigendecomposition, and nothing may stay pinned."""
    import numpy as np

    from breweries_etl_spark.operators.mltrain import pca_top_component

    rng = np.random.default_rng(3)
    d, n = 8, 400
    base = rng.normal(size=(n, d))
    base[:, 0] *= 5.0  # dominant direction
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pca_top_component(df, dim=d).collect()[0]
    cov = np.cov(base, rowvar=False)
    evals = np.linalg.eigvalsh(cov)
    assert out["n"] == n and out["dim"] == d
    assert abs(out["trace_cov"] - float(np.trace(cov))) < 1e-3
    # 3 power iterations on a strongly dominant eigenvalue: ~1% accuracy
    assert abs(out["top_eigenvalue"] - float(evals[-1])) / evals[-1] < 0.02
    assert 0 < out["explained_ratio"] <= 1
    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    assert persistent.size() == 0, f"leaked {persistent.size()} persisted RDDs"
