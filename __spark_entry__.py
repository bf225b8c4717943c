"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship gold aggregation at sf0.001;
``queries()`` exposes every implemented operator (SURVEY.md §2 + the
scale extensions) as (spark, sf_dir) -> DataFrame; ``oracle_sql()``
carries the DuckDB-equivalent SQL per query. Column names/aliases match
pairwise so the driver's order-insensitive value hash compares cleanly.

Float policy: money-style aggregates go through exact DECIMAL sums in
BOTH engines (see breweries_etl_spark/functions/exact.py) so doubles are
bit-identical; per-row derived floats are rounded to 6 dp on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from breweries_etl_spark.config import KEY_FIELDS
from breweries_etl_spark.functions.exact import (
    sql_disc_price,
    sql_charge,
    sql_sum_money,
)
from breweries_etl_spark.functions.synthetic import BREWERY_RAW_SQL, brewery_raw
from breweries_etl_spark.operators import aggregate as agg_ops
from breweries_etl_spark.operators import quality
from breweries_etl_spark.operators import standardize
from breweries_etl_spark.plans import analytics
from breweries_etl_spark.sources.tables import load_events, load_table

# ---------------------------------------------------------------------------
# Shared SQL fragments (oracle side)
# ---------------------------------------------------------------------------

_CANON = "('micro','nano','regional','brewpub','large','planning','bar','contract','proprietor','closed')"

# SQL replication of operators/standardize.py silver chain (C1-C5, C8),
# minus the nondeterministic processed_at column.
_SILVER_SELECT = f"""
SELECT
  id,
  name,
  CASE
    WHEN brewery_type IS NULL THEN 'unknown'
    WHEN lower(trim(brewery_type)) IN {_CANON} THEN lower(trim(brewery_type))
    ELSE 'other'
  END AS brewery_type,
  upper(state) AS state,
  upper(city) AS city,
  upper(country) AS country,
  upper(country) AS location,
  CASE
    WHEN website_url IS NULL OR trim(website_url) = '' THEN NULL
    WHEN trim(website_url) LIKE 'http://%' OR trim(website_url) LIKE 'https://%'
      THEN trim(website_url)
    ELSE 'http://' || trim(website_url)
  END AS website_url,
  '1.0' AS etl_version
FROM valid
"""

_VALID_FILTER = " AND ".join(f"{c} IS NOT NULL" for c in KEY_FIELDS)

_SILVER_CTE = f"""
WITH raw AS ({BREWERY_RAW_SQL}),
valid AS (SELECT * FROM raw WHERE {_VALID_FILTER}),
silver AS ({_SILVER_SELECT})
"""

_SILVER_OUT_COLS = [
    "id",
    "name",
    "brewery_type",
    "state",
    "city",
    "country",
    "location",
    "website_url",
    "etl_version",
]


def _silver_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side silver: shared raw constructor -> package operators."""
    raw = brewery_raw(spark, sf_dir)
    valid, _quarantined = quality.split_invalid_records(raw)
    return standardize.silver_transform(valid).select(*_SILVER_OUT_COLS)


# ---------------------------------------------------------------------------
# Queries — reference parity (SURVEY.md §2)
# ---------------------------------------------------------------------------


def q_gold_by_type_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 — THE gold aggregation over the standardized silver frame."""
    silver = _silver_df(spark, sf_dir)
    return agg_ops.create_aggregation(
        silver, ["brewery_type", "location", "state", "city"], "brewery_count"
    )


def q_gold_by_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = _silver_df(spark, sf_dir)
    return agg_ops.gold_aggregations(silver)["by_location"]


def q_silver_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _silver_df(spark, sf_dir)


def q_brewery_type_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 in isolation, applied pre-split so the NULL→'unknown' branch is
    exercised (the pipeline quarantines NULL keys before recode)."""
    raw = brewery_raw(spark, sf_dir)
    return raw.select(
        F.col("name"),
        standardize.brewery_type_expr(F.col("brewery_type")).alias("brewery_type_std"),
    )


def q_quarantine_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = brewery_raw(spark, sf_dir)
    valid, _ = quality.split_invalid_records(raw)
    return valid.select("id", "name", "brewery_type", "state", "city", "country")


def q_quarantine_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = brewery_raw(spark, sf_dir)
    _, rejected = quality.split_invalid_records(raw)
    # quarantine_timestamp is wall-clock → excluded from the compared frame
    return rejected.select("name", "id", "country", "quarantine_reason")


def q_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = brewery_raw(spark, sf_dir)
    return quality.null_counts(raw, KEY_FIELDS)


def q_count_distinct_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = _silver_df(spark, sf_dir)
    return quality.count_distinct(silver, "location")


def q_duplicate_key_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return quality.count_duplicate_ids(li, "l_orderkey")


def q_value_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return agg_ops.value_counts(ev, "event_type", "count")


def q_row_count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_ops.row_count(load_table(spark, sf_dir, "lineitem"))


def q_union_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — unionByName fan-in of two disjoint slices (the reference's
    manual partition-concat, obsolete under native partition discovery)."""
    orders = load_table(spark, sf_dir, "orders")
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    return lo.unionByName(hi).select("o_orderkey", "o_orderstatus", "o_totalprice")


def q_sample_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — deterministic limit-n diagnostic sample (reference uses
    head(3); ordered here so the result is stable)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select("c_name")
        .na.drop()
        .orderBy("c_name")
        .limit(3)
    )


# ---------------------------------------------------------------------------
# Oracle SQL
# ---------------------------------------------------------------------------

_ORACLES: dict[str, str] = {
    "gold_by_type_location": _SILVER_CTE
    + """
SELECT brewery_type, location, state, city, count(*) AS brewery_count
FROM silver GROUP BY brewery_type, location, state, city
""",
    "gold_by_location": _SILVER_CTE
    + """
SELECT location, state, city, count(*) AS brewery_count
FROM silver GROUP BY location, state, city
""",
    "silver_transform": _SILVER_CTE + "SELECT * FROM silver",
    "brewery_type_recode": f"""
WITH raw AS ({BREWERY_RAW_SQL})
SELECT name,
  CASE
    WHEN brewery_type IS NULL THEN 'unknown'
    WHEN lower(trim(brewery_type)) IN {_CANON} THEN lower(trim(brewery_type))
    ELSE 'other'
  END AS brewery_type_std
FROM raw
""",
    "quarantine_valid": f"""
WITH raw AS ({BREWERY_RAW_SQL})
SELECT id, name, brewery_type, state, city, country
FROM raw WHERE {_VALID_FILTER}
""",
    "quarantine_rejected": f"""
WITH raw AS ({BREWERY_RAW_SQL})
SELECT name, id, country, 'missing_key_values' AS quarantine_reason
FROM raw WHERE NOT ({_VALID_FILTER})
""",
    "null_counts": f"""
WITH raw AS ({BREWERY_RAW_SQL})
SELECT
  {", ".join(f"count(CASE WHEN {c} IS NULL THEN 1 END) AS {c}_nulls" for c in KEY_FIELDS)}
FROM raw
""",
    "count_distinct_location": _SILVER_CTE
    + "SELECT count(DISTINCT location) AS location_distinct FROM silver",
    "duplicate_key_count": """
SELECT CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt - 1 END), 0) AS BIGINT) AS duplicate_count
FROM (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey)
""",
    "value_counts_events": """
SELECT event_type, count(*) AS count FROM events GROUP BY event_type
""",
    "row_count_lineitem": "SELECT count(*) AS n_rows FROM lineitem",
    "union_fanin": """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
""",
    "sample_top3": """
SELECT c_name FROM customer WHERE c_name IS NOT NULL ORDER BY c_name LIMIT 3
""",
    # ----- relational analytics (joins/windows/rollup; SURVEY.md §2.6 note)
    "tpch_q1": f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  {sql_sum_money('l_extendedprice', 'sum_base_price')},
  CAST(SUM({sql_disc_price()}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({sql_charge()}) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "tpch_q3": f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM({sql_disc_price()}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate > DATE '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    "tpch_q5": f"""
SELECT n_name, CAST(SUM({sql_disc_price()}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    "tpch_q6": """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "topk_orders_per_customer": """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_customer
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      AS rank_in_customer
  FROM orders
)
WHERE rank_in_customer <= 3
""",
    "rollup_orders": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
  grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS grouping_level
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    "semi_join_customers": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    "anti_join_customers": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-01-01'
)
""",
}


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's gold by_type_location aggregation over
    the standardized silver frame, at sf0.001."""
    return q_gold_by_type_location(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # reference parity (SURVEY.md §2)
        "gold_by_type_location": q_gold_by_type_location,
        "gold_by_location": q_gold_by_location,
        "silver_transform": q_silver_transform,
        "brewery_type_recode": q_brewery_type_recode,
        "quarantine_valid": q_quarantine_valid,
        "quarantine_rejected": q_quarantine_rejected,
        "null_counts": q_null_counts,
        "count_distinct_location": q_count_distinct_location,
        "duplicate_key_count": q_duplicate_key_count,
        "value_counts_events": q_value_counts_events,
        "row_count_lineitem": q_row_count_lineitem,
        "union_fanin": q_union_fanin,
        "sample_top3": q_sample_top3,
        # relational analytics
        "tpch_q1": analytics.tpch_q1,
        "tpch_q3": analytics.tpch_q3,
        "tpch_q5": analytics.tpch_q5,
        "tpch_q6": analytics.tpch_q6,
        "topk_orders_per_customer": analytics.topk_orders_per_customer,
        "rollup_orders": analytics.rollup_orders,
        "semi_join_customers": analytics.customers_with_big_orders,
        "anti_join_customers": analytics.customers_without_recent_orders,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
