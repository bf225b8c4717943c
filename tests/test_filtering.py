"""Gopher-style quality filters and embedding clustering: hand-computed
repetition fractions, flag thresholds, corpus dup-ngram counts, centroid
assignment vs numpy, balanced-sample quotas, mixture weights."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from breweries_etl_spark.operators.clustering import (
    centroid_assign,
    cluster_balanced_sample,
    leading_centroids,
    mixture_weights,
)
from breweries_etl_spark.operators.filtering import (
    gopher_quality_flags,
    ngram_dup_fraction,
    repetition_stats,
)

DOCS = [
    # 6 words, 3 distinct; "spam spam" bigram occurs 3 of 5 times
    Row(doc_id=1, text="spam spam spam spam eggs ham"),
    # all-distinct words, no repeated bigram
    Row(doc_id=2, text="one two three four five"),
    # empty after normalization -> no output row
    Row(doc_id=3, text="!!! ???"),
]


def test_repetition_stats_hand_computed(spark):
    out = {r["doc_id"]: r for r in repetition_stats(spark.createDataFrame(DOCS)).collect()}
    assert set(out) == {1, 2}  # doc 3 has no tokens
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_distinct_words"] == 3
    assert r1["dup_word_fraction"] == 0.5
    assert r1["top_word_fraction"] == round(4 / 6, 6)
    # bigrams: 'spam spam' x3, 'spam eggs', 'eggs ham'
    assert r1["n_bigrams"] == 5 and r1["top_bigram_fraction"] == 0.6
    r2 = out[2]
    assert r2["dup_word_fraction"] == 0.0
    assert r2["top_bigram_fraction"] == 0.25  # 4 bigrams, each once


def test_gopher_flags_thresholds(spark):
    long_ok = " ".join(f"w{i:03d} the and" for i in range(20))  # 60 words, stopwords, low repetition
    docs = [
        Row(doc_id=1, text=long_ok),
        Row(doc_id=2, text="short text only here"),  # fails word-count floor
    ]
    out = {r["doc_id"]: r for r in gopher_quality_flags(spark.createDataFrame(docs)).collect()}
    assert out[2]["ok_word_count"] is False and out[2]["keep"] is False
    r1 = out[1]
    assert r1["ok_word_count"] is True
    assert r1["ok_stopwords"] is True
    assert r1["ok_symbol_ratio"] is True  # no '#' or '...'
    # keep is the conjunction of all flags
    flags = [r1[c] for c in ("ok_word_count", "ok_mean_word_len",
                             "ok_symbol_ratio", "ok_stopwords", "ok_repetition")]
    assert r1["keep"] == all(flags)


def test_gopher_symbol_ratio_counts_hash_and_ellipsis(spark):
    docs = [Row(doc_id=1, text="# one two ... three # four")]
    r = gopher_quality_flags(spark.createDataFrame(docs)).collect()[0]
    # 2 '#' + 1 '...' over 4 normalized words
    assert r["symbol_ratio"] == 0.75


def test_ngram_dup_fraction_shared_spans(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    docs = [
        Row(doc_id=1, text=shared + " one two three"),
        Row(doc_id=2, text=shared + " four five six"),
        Row(doc_id=3, text="totally different words here padding tokens extra"),
    ]
    out = {r["doc_id"]: r for r in
           ngram_dup_fraction(spark.createDataFrame(docs), n=5).collect()}
    # the two 5-grams fully inside the shared span appear in both docs
    assert out[1]["n_shared"] == 2 and out[2]["n_shared"] == 2
    assert out[3]["n_shared"] == 0 and out[3]["shared_fraction"] == 0.0


def test_centroid_assign_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned = {r["vec_id"]: r["cluster_id"]
                for r in centroid_assign(emb, leading_centroids(emb, 4)).collect()}
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    cents = [vecs[i] for i in sorted(vecs)[:4]]
    for vid, v in vecs.items():
        sims = np.round([v @ c / (np.linalg.norm(v) * np.linalg.norm(c)) for c in cents], 6)
        assert assigned[vid] == int(np.argmax(sims)), vid


def test_balanced_sample_quota_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned = centroid_assign(emb, leading_centroids(emb, 4))
    s1 = cluster_balanced_sample(assigned, 5).collect()
    per_cluster = {}
    for r in s1:
        per_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    assert all(len(v) <= 5 for v in per_cluster.values())
    # deterministic under repartitioning
    s2 = cluster_balanced_sample(assigned.repartition(13), 5).collect()
    assert sorted((r["vec_id"], r["cluster_id"], r["sample_rank"]) for r in s1) == \
        sorted((r["vec_id"], r["cluster_id"], r["sample_rank"]) for r in s2)


def test_mixture_weights_sum_and_values(spark):
    docs = [Row(doc_id=i, lang="en" if i < 8 else "de") for i in range(10)]
    out = {r["lang"]: r for r in mixture_weights(
        spark.createDataFrame(docs), "lang", {"en": 0.5, "de": 0.5}).collect()}
    assert out["en"]["share"] == 0.8 and out["de"]["share"] == 0.2
    assert out["en"]["weight"] == 0.625 and out["de"]["weight"] == 2.5


def test_classifier_quality_score_matches_numpy(spark):
    """Hashed-linear classifier: Spark expression fold equals the numpy
    reference; empty/null text scores the sigmoid(0) neutral 0.5."""
    import hashlib
    import math
    import re

    import numpy as np

    from breweries_etl_spark.operators.filtering import (
        classifier_quality_score,
        classifier_weights,
    )

    docs = [
        Row(doc_id=0, text="The quick brown Fox jumps over 42 lazy dogs"),
        Row(doc_id=1, text="spam spam spam buy now http cheap"),
        Row(doc_id=2, text=""),
        Row(doc_id=3, text=None),
    ]
    out = {r["doc_id"]: r for r in classifier_quality_score(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    w = np.array(classifier_weights(256, 13))
    for d in docs[:2]:
        toks = re.findall(r"[A-Za-z0-9_]+", d.text.lower())
        buckets = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 256 for t in toks
        ]
        z = float(np.sum(w[buckets]) / len(buckets))
        expected = round(1.0 / (1.0 + math.exp(-z)), 6)
        assert abs(out[d.doc_id]["quality_score"] - expected) < 1e-9
        assert out[d.doc_id]["keep"] == (expected >= 0.5)
    assert out[2]["quality_score"] == 0.5 and out[2]["keep"]
    assert out[3]["quality_score"] == 0.5 and out[3]["keep"]
