"""Relational analytics plan-quality and correctness checks."""

from __future__ import annotations

import pytest

from breweries_etl_spark.plans import analytics


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _explain(analytics.tpch_q1(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 needed columns — no full-width scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q3_broadcasts_customer(spark, sf_dir):
    plan = _explain(analytics.tpch_q3(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter reached the scan


def test_q6_all_filters_pushed(spark, sf_dir):
    plan = _explain(analytics.tpch_q6(spark, sf_dir))
    for frag in ["GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity,24.0)",
                 "GreaterThanOrEqual(l_discount,0.05)"]:
        assert frag in plan


def test_pivot_counts(spark, sf_dir):
    out = analytics.pivot_events(spark, sf_dir)
    row = out.filter("user_id = 1").first()
    total = sum(row[f"n_{t}"] for t in analytics.EVENT_TYPES)
    assert total > 0  # coalesced, never null


def test_cube_grand_total(spark, sf_dir):
    rows = analytics.cube_orders(spark, sf_dir).collect()
    grand = [r for r in rows if r["grouping_level"] == 3]
    assert len(grand) == 1
    detail_sum = sum(r["n_orders"] for r in rows if r["grouping_level"] == 0)
    assert grand[0]["n_orders"] == detail_sum


def test_quantiles_ordered(spark, sf_dir):
    r = analytics.price_quantiles(spark, sf_dir).first()
    assert r["q25"] <= r["q50"] <= r["q75"]


def test_running_total_monotone_for_positive_values(spark, sf_dir):
    out = analytics.running_aggregates(spark, sf_dir).filter("user_id = 1") \
        .orderBy("ts_us").collect()
    totals = [r["running_total"] for r in out]
    assert totals == sorted(totals)
    assert out[0]["running_total"] == pytest.approx(out[0]["avg_last3"])


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = _explain(analytics.tpch_q4_priority(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_decorrelated_no_cartesian(spark, sf_dir):
    """EXISTS + NOT EXISTS collapse into one per-order aggregate — the
    plan must contain no cartesian product or nested-loop blowup."""
    df = analytics.tpch_q21_waiting_supplier(spark, sf_dir)
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert len(rows) > 0
    # numwait sums late lines of sole-late suppliers in shared orders
    assert all(r["numwait"] >= 1 for r in rows)


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    plan = _explain(analytics.tpch_q22_dormant_customers(spark, sf_dir))
    assert "LeftAnti" in plan
    # the scalar average arrives via broadcast, not a shuffled join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q8_share_bounded(spark, sf_dir):
    rows = analytics.tpch_q8_market_share(spark, sf_dir).collect()
    assert rows and all(0.0 <= r["mkt_share"] <= 1.0 for r in rows)


def test_q2_best_balance_is_max_per_part(spark, sf_dir):
    rows = analytics.tpch_q2_best_supplier(spark, sf_dir).collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], []).append(r["s_acctbal"])
    # every returned supplier carries its part's maximum balance
    assert all(len(set(v)) == 1 for v in by_part.values())
