"""Relational analytics over the driver testdata: joins, multi-agg
group-bys, windows, rollups, semi/anti joins.

The reference contains no joins at all (SURVEY.md §2.6) — its pipeline is
single-entity — so this module is where the engine demonstrates the
join/window/sort capabilities a user scaling past the reference needs,
expressed as declarative DataFrame plans Catalyst can optimize:

- Dimension joins (region/nation/supplier) stay under the broadcast
  threshold at every SF → zero-shuffle hash joins on the build side.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key once; AQE
  handles skew and coalesces post-shuffle partitions.
- Filters are written against base columns before joins so Catalyst
  pushes them into the parquet scan (check: PushedFilters in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import charge, disc_price, money, sum_money
from ..sources.tables import load_table


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: 2-key groupBy, 8 aggregates, one scan.
    Exact-decimal sums (see functions.exact) keep results reproducible at
    any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            sum_money("l_extendedprice", "sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("long")) / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(money("l_discount")).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join, filter pushdown on both
    fact scans, top-10 by revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: 6-table join where region,
    nation, and supplier broadcast; customer/orders/lineitem shuffle on
    their keys once each."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # Customer and supplier must share the nation (Q5's "local supplier").
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(cust.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure filter+agg — every predicate
    reaches the parquet scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(money("l_extendedprice") * money("l_discount")).cast("double").alias("revenue"))
    )


def topk_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-K per group via ranking window — the canonical Spark top-k that
    avoids a global sort (partial top-k per partition, then per-key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_customer") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_customer")
    )


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): subtotals + grand total in one
    pass — the generalization of the reference's two separate gold
    group-bys (SURVEY.md §2.5 note on A2/A3)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_price"),
            F.grouping_id().alias("grouping_level"),
        )
    )


def customers_with_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (SQL EXISTS): customers having any order above a
    threshold. Semi-join short-circuits on first match — cheaper than a
    join+distinct."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item revenue: 4-way join, group by customer,
    top-20. Customer/nation broadcast-able at any realistic dim size."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promo revenue share: conditional aggregation over a
    fact⋈dim join, single output row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), disc_price()).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    total = F.sum(disc_price()).cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_revenue_pct")
    )


def tpch_q18_large_orders(
    spark: SparkSession, sf_dir: str, min_qty: int = 150
) -> DataFrame:
    """TPC-H Q18 large-volume orders: aggregate-then-join (the HAVING
    subquery decorrelated into a pre-aggregation that shrinks the join
    input)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "l_orderkey", "o_totalprice", "sum_qty")
    )


def tpch_q19_brand_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive join predicate: OR-of-ANDs across both
    sides. Catalyst extracts the common join key; the residual disjunction
    evaluates post-join inside codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 35))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT join keeps
    zero-order customers, then a second aggregation over the first —
    the histogram-of-aggregates shape."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier(s) by quarterly revenue: aggregate, take
    the max via a second tiny aggregate, join back (no correlated
    subquery; two passes over a small intermediate)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(disc_price()).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.max_revenue)
        .join(F.broadcast(supp), revenue.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: per-part average quantity
    (decorrelated into an aggregate-join), lineitems below 20% of their
    part's average."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        ((F.sum(F.col("l_quantity").cast("long")) / F.count(F.lit(1))) * 0.2).alias(
            "qty_threshold"
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping levels in one
    pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(money("o_totalprice")).cast("double").alias("total_price"),
        F.grouping_id().alias("grouping_level"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user. The pivot values are DECLARED, not
    discovered — at scale an undeclared pivot triggers an extra distinct
    scan and nondeterministic column order."""
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    out = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (percentile, not approx sketch) —
    matches quantile_cont semantics. At 100 TB switch callers to
    percentile_approx and drop the oracle claim."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        *[
            F.round(F.percentile(F.col("l_extendedprice"), F.lit(p)), 6).alias(name)
            for p, name in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75")]
        ]
    )


def running_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames over event streams: running total (unbounded
    preceding) and 3-row moving average per user. Exact-decimal sums keep
    the running values reproducible."""
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = order.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.sum(money("value")).over(running).cast("double").alias("running_total"),
        (
            F.sum(money("value")).over(last3).cast("double")
            / F.count(F.lit(1)).over(last3)
        ).alias("avg_last3"),
    )


def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated scalar subquery: customers with balance above their
    nation's average. The correlated form would re-aggregate per row; the
    decorrelated aggregate-join computes each nation average once."""
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "nation_avg"
        )
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_acctbal", F.round("nation_avg", 6).alias("nation_avg"))
    )


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped two-nation shipping volume: supplier-nation ×
    customer-nation pairs per year. Exercises the double-dimension join
    with a cross-pair predicate and year extraction."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev_pair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair | rev_pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


def hourly_heavy_hitters(spark: SparkSession, sf_dir: str, k: int = 2) -> DataFrame:
    """Top-k event types per hour: windowed aggregation feeding a ranking
    window — the streaming-dashboard 'heavy hitters' shape in batch."""
    from ..sources.tables import load_events

    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    ranked = hourly.select(
        F.col("w.start").cast("long").alias("window_start"), "event_type", "n"
    ).withColumn(
        "rank",
        F.row_number()
        .over(
            # NULLS LAST explicit: the NULL event-type bucket flipped
            # rank-2 ties between engines (degen r10)
            Window.partitionBy("window_start").orderBy(
                F.desc("n"), F.asc_nulls_last("event_type")
            )
        )
        .cast("long"),
    )
    return ranked.filter(F.col("rank") <= k)


def nation_customer_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates: per-nation customer counts vs
    supplier counts — nations appearing on either side survive with
    zero-filled gaps. Completes the join-type family (inner/left/semi/
    anti/asof elsewhere)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def customers_without_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (SQL NOT EXISTS): customers with no order since
    2000-01-01."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (round 2). The driver testdata has no partsupp
# table and lineitem lacks commit/receipt dates and shipmode, so q2, q11,
# q16, and q20 use the DISTINCT (l_partkey, l_suppkey) pairs observed in
# lineitem as the part-supplier bridge, and the "late" predicates compare
# l_shipdate against o_orderdate + INTERVAL — same query SHAPES (and the
# same Catalyst exercises: decorrelation, semi/anti joins, scalar
# subqueries, conditional aggregation), adapted columns.
# ---------------------------------------------------------------------------


def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped priority check: EXISTS decorrelated to a left-semi
    join with a non-equi residual (shipment >30 days after order date).
    Semi-join short-circuits per order — no fact-fact row blowup."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_1 suppliers' share of PROMO
    volume sold into ASIA, per year. All dimensions broadcast; the fact
    chain shuffles on its join keys once each."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = disc_price()
    national = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(national).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit by supplier nation and year.
    No partsupp table, so supply cost is modeled as 60% of p_retailprice —
    the arithmetic stays all-decimal (exact, order-independent)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    nation = load_table(spark, sf_dir, "nation")
    amount = disc_price() - (
        money("p_retailprice")
        * F.lit("0.60").cast("decimal(3,2)")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-delay audit: lines shipped >60 days after
    the order date in 1996, split by line status (shipmode stand-in),
    counting urgent vs non-urgent orders — conditional aggregation over
    one fact-fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the classic
    EXISTS/NOT-EXISTS pair decorrelated into ONE per-order aggregate
    (distinct suppliers, distinct LATE suppliers) joined back to the late
    lines — two correlated subqueries become a single extra shuffle on
    l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        lo.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped dormant high-balance customers: scalar subquery
    (average positive balance) broadcast into a filter, anti-join against
    RECENT orders (since 1999 — every customer has some order in this
    data), grouped by market segment. The scalar is one row — the
    crossJoin is a broadcast nested loop over literals, not a real
    cartesian."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("date")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def _part_supplier_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (l_partkey, l_suppkey) pairs — the partsupp stand-in.
    One shuffle of two int columns; at 100 TB this is the index table
    you would persist as a bucketed table instead of recomputing."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()


def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped best supplier per part: for LARGE parts of size
    >=25, the EUROPE supplier with the highest account balance among
    those who have supplied the part. The correlated MIN(ps_supplycost)
    subquery becomes a per-part max-balance aggregate joined back —
    decorrelation as an aggregate-join, no per-row subquery."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 25)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    bridge = _part_supplier_bridge(spark, sf_dir)
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = bridge.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey).join(
        eu_supp, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    best = cand.groupBy(F.col("ps_partkey").alias("bk")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        cand.join(
            best,
            (F.col("ps_partkey") == F.col("bk"))
            & (F.col("s_acctbal") == F.col("best_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important stock: per-part shipped value for
    NATION_3 suppliers, kept if above 1/1000 of the national total —
    the HAVING > (scalar subquery * fraction) shape, computed as one
    aggregate reused for both sides (self-referential scalar broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    national = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(money("l_extendedprice")).cast("double").alias("value"))
    )
    threshold = national.agg((F.sum("value") / F.lit(1000.0)).alias("threshold"))
    return (
        national.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("ps_partkey", F.round("value", 6).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier counts per (brand, type, size), excluding
    Brand#1: distinct-supplier count over the part-supplier bridge.
    Count-distinct shuffles (key, suppkey) pairs — partial dedup map-side."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(10, 20, 30, 40, 49))
    )
    bridge = _part_supplier_bridge(spark, sf_dir)
    return (
        bridge.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def tpch_q20_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped heavy shippers of a part family: suppliers in
    NATION_5 who shipped more than 100 units of 'blue' parts in 1996 —
    nested IN-subqueries flattened to aggregate → semi-join chain."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("blue"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("shipped_qty"))
        .filter(F.col("shipped_qty") > 100)
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "shipped_qty")
        .orderBy("s_name")
    )
