"""Plan-budget regression guards: key queries must not silently grow
extra shuffles or lose broadcast decisions across refactors. Counts
Exchange operators in the formatted physical plan (BroadcastExchange
excluded — broadcasts are the cheap kind we want)."""

from __future__ import annotations

import re

from breweries_etl_spark.plans import analytics


def _exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))


def test_q1_at_most_two_exchanges(spark, sf_dir):
    # one for the aggregation, one range-exchange for the final orderBy
    assert _exchanges(analytics.tpch_q1(spark, sf_dir)) <= 2


def test_q6_single_partial_agg_exchange(spark, sf_dir):
    assert _exchanges(analytics.tpch_q6(spark, sf_dir)) <= 1


def test_q3_fact_join_plus_agg_budget(spark, sf_dir):
    # dims broadcast; remaining shuffles: (possibly) fact-fact join sides
    # + group agg + top-n sort
    assert _exchanges(analytics.tpch_q3(spark, sf_dir)) <= 4


def test_topk_single_shuffle(spark, sf_dir):
    # one hash exchange for the window partitioning
    assert _exchanges(analytics.topk_orders_per_customer(spark, sf_dir)) <= 1


def test_gold_pipeline_budget(spark, sf_dir):
    from __spark_entry__ import q_gold_by_type_location

    # silver transform is shuffle-free (projections/filters only);
    # the gold groupBy adds the single hash exchange, dims broadcast
    assert _exchanges(q_gold_by_type_location(spark, sf_dir)) <= 1
