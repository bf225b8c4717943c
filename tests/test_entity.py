"""Entity resolution: blocking, edit-distance matching, transitive
clustering, singleton passthrough."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.operators.entity import (
    blocked_name_pairs,
    resolve_entities,
)


def _recs(spark, rows):
    return spark.createDataFrame(
        [Row(record_id=i, name=n, block=b) for i, n, b in rows],
        "record_id long, name string, block long",
    )


def test_resolve_merges_within_distance_and_transitively(spark):
    recs = _recs(
        spark,
        [
            (1, "acme corp", 0),
            (2, "acme c0rp", 0),   # dist 1 from 1
            (3, "acme c0rq", 0),   # dist 1 from 2, dist 2 from 1 -> transitive
            (4, "zenith ltd", 0),  # unmatched singleton
            (5, "acme corp", 1),   # same name, DIFFERENT block -> no merge
        ],
    )
    got = {r["record_id"]: r["entity_id"] for r in resolve_entities(recs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4
    assert got[5] == 5  # blocking respected


def test_blocked_pairs_carry_names_and_respect_cap(spark):
    recs = _recs(spark, [(i, f"name{i}", 0) for i in range(5)])
    pairs = blocked_name_pairs(recs).collect()
    assert len(pairs) == 10  # C(5,2)
    assert all(p["name_a"] == f"name{p['id_a']}" for p in pairs)
    # a block above the cap is dropped entirely
    big = _recs(spark, [(i, f"n{i}", 0) for i in range(30)])
    assert blocked_name_pairs(big, max_block=10).count() == 0


def test_resolution_is_deterministic_under_repartition(spark):
    rows = [(i, f"record {i // 3}", i % 4) for i in range(40)]
    a = {
        r["record_id"]: r["entity_id"]
        for r in resolve_entities(_recs(spark, rows)).collect()
    }
    b = {
        r["record_id"]: r["entity_id"]
        for r in resolve_entities(_recs(spark, rows).repartition(13)).collect()
    }
    assert a == b
