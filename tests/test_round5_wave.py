"""Round-5 wave: scale-safe twins of the global-sort window forms
(VERDICT r4 #6 / next-round #2)."""

from __future__ import annotations

from pyspark.sql import Row


def test_curriculum_scalable_matches_ntile_away_from_ties(spark):
    from breweries_etl_spark.operators.corpus import (
        curriculum_buckets,
        curriculum_stages_scalable,
    )

    # distinct scores, count divisible by n_stages: the two forms must
    # produce identical stage summaries (ties are the ONLY divergence)
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=10 * i) for i in range(1, 9)],
        schema="doc_id long, n_chars long",
    )
    exact = {r["stage"]: r.asDict() for r in curriculum_buckets(docs).collect()}
    scal = {
        r["stage"]: r.asDict() for r in curriculum_stages_scalable(docs).collect()
    }
    assert exact == scal
    assert sorted(scal) == [1, 2, 3, 4]
    assert all(v["n_docs"] == 2 for v in scal.values())


def test_curriculum_scalable_ties_land_lower(spark):
    from breweries_etl_spark.operators.corpus import curriculum_stages_scalable

    # six docs all tied at one value + two above: every tied doc must
    # land in the same (lower) stage — deterministic on any partitioning
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=100) for i in range(6)]
        + [Row(doc_id=10, n_chars=200), Row(doc_id=11, n_chars=300)],
        schema="doc_id long, n_chars long",
    )
    rows = {r["stage"]: r for r in curriculum_stages_scalable(docs).collect()}
    assert rows[1]["n_docs"] == 6 and rows[1]["max_score"] == 100
    assert sum(r["n_docs"] for r in rows.values()) == 8


def test_rfm_scalable_contract(spark, sf_dir):
    from breweries_etl_spark.operators.behavior import (
        rfm_segments,
        rfm_segments_scalable,
    )
    from breweries_etl_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    exact = {r["user_id"]: r for r in rfm_segments(ev).collect()}
    scal = {r["user_id"]: r for r in rfm_segments_scalable(ev).collect()}
    # same user set, same R/F/M raw values, buckets in range
    assert set(exact) == set(scal)
    for uid, r in scal.items():
        assert r["frequency"] == exact[uid]["frequency"]
        assert r["monetary"] == exact[uid]["monetary"]
        assert 1 <= r["r_bucket"] <= 4
        assert 1 <= r["f_bucket"] <= 4
        assert 1 <= r["m_bucket"] <= 4
        assert r["segment"] == f"{r['r_bucket']}-{r['f_bucket']}-{r['m_bucket']}"
    # the top-monetary user is in m_bucket 1 under the >=-threshold rule
    top = max(scal.values(), key=lambda r: r["monetary"])
    assert top["m_bucket"] == 1
    # buckets are monotone in the metric: a user with higher monetary
    # never lands in a numerically larger (worse) m_bucket
    by_m = sorted(scal.values(), key=lambda r: -r["monetary"])
    assert all(a["m_bucket"] <= b["m_bucket"] for a, b in zip(by_m, by_m[1:]))
