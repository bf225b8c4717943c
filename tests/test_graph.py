"""Connected components over near-dup pairs: correctness on planted
topologies, convergence, cache hygiene."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.operators.graph import (
    connected_components,
    dedup_cluster_canonical,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
    )


def test_chain_collapses_to_one_cluster(spark):
    # 1-2-3-4 chain: diameter 3, needs multiple propagation rounds
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_keep_separate_labels(spark):
    pairs = _pairs(spark, [(1, 2), (5, 6), (6, 7), (10, 11)])
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_cluster_canonical_counts(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (8, 9)])
    rows = {r["cluster_id"]: r for r in dedup_cluster_canonical(pairs).collect()}
    assert rows[1]["cluster_size"] == 3 and rows[1]["n_to_drop"] == 2
    assert rows[8]["cluster_size"] == 2 and rows[8]["n_to_drop"] == 1


def test_components_release_caches(spark):
    spark.catalog.clearCache()
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    connected_components(pairs).collect()
    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    assert persistent.size() == 0, f"leaked {persistent.size()} persisted RDDs"
