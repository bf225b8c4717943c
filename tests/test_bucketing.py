"""Bucketed tables: pre-shuffled layout so fact-fact joins need no
exchange — the 100 TB co-location strategy (SURVEY.md §7 'Partitioning &
shuffle'). Asserts the physical plan, not just the result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; session one is fine (tables dropped after)
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    from breweries_etl_spark.sinks.writers import write_bucketed_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", "o_orderkey")
    write_bucketed_table(lineitem, "b_lineitem", "l_orderkey")

    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan
    # the join inputs read bucketed data: no Exchange below the join
    join_section = plan.split("SortMergeJoin")[0]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # result parity with the unbucketed join
    plain = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in joined.collect()} == {tuple(r) for r in plain.collect()}
