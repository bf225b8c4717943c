"""Expression-placement regression guards (judge r7 #1, the
levene_test regression): decimal-splitting conversions
(dec_double / dec_double_wide / dec_double_wide_frac) of JOIN-CARRIED
AGGREGATE constants must be materialized on the k-row aggregated
relation, never inlined into per-fact-row expressions — Catalyst
collapses such a projection into the downstream aggregate and
re-evaluates the BigDecimal-splitting subtree per fact row per
aggregate expression (measured 5.5x at sf0.1 on levene).

The guard reads the FORMATTED physical plan: any node block whose
``Input`` includes a fact-side column must not contain a
decimal-split fingerprint. The fingerprints:

- ``% 1000000000`` — the dec_double_wide / _frac hi/lo modulo split;
- ``as bigint) as double`` — dec_double's exact int64 crossing.

Aggregated-relation blocks (per-group moments, 1-row moment
relations) may carry the fingerprints freely — that is exactly where
the conversions belong.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from breweries_etl_spark.operators.hypotests import (
    breusch_pagan,
    cooks_distance_top,
    grubbs_max_outlier,
    levene_test,
)

_FINGERPRINTS = ("% 1000000000", "as bigint) as double")


def _offending_blocks(df, fact_col_names) -> list[str]:
    """Plan blocks that BOTH read a fact column and contain a
    decimal-split fingerprint — the per-fact-row re-evaluation shape."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    offenders = []
    for block in plan.split("\n\n"):
        inputs = " ".join(
            line for line in block.splitlines() if line.startswith("Input")
        )
        reads_fact = any(
            re.search(rf"[\[, ]{re.escape(c)}#\d", inputs)
            for c in fact_col_names
        )
        if reads_fact and any(fp in block for fp in _FINGERPRINTS):
            offenders.append(block.splitlines()[0])
    return offenders


def test_levene_mean_materialized_off_fact_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = levene_test(df, "o_orderpriority", "o_totalprice")
    assert _offending_blocks(q, ["__v"]) == []


def test_grubbs_mean_materialized_off_fact_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = grubbs_max_outlier(df, "o_orderkey", "o_totalprice")
    assert _offending_blocks(q, ["__x", "__k"]) == []


def test_breusch_pagan_fit_materialized_off_fact_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = breusch_pagan(df, "l_quantity", "l_extendedprice")
    assert _offending_blocks(q, ["x", "y"]) == []


def test_cooks_fit_materialized_off_fact_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = cooks_distance_top(
        df, "l_quantity", "l_extendedprice", ["l_orderkey", "l_linenumber"]
    )
    assert _offending_blocks(q, ["x", "y"]) == []


def test_guard_catches_the_broken_shape(spark, sf_dir):
    """Meta-test: reconstruct the r7 levene regression inline and
    assert the guard DOES flag it — so a silent helper change cannot
    make these tests vacuously green."""
    from breweries_etl_spark.operators.hypotests import (
        anova_oneway,
        dec_double_wide_frac,
        quantized_money,
    )

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = df.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderpriority").alias("__g"),
        quantized_money(F.col("o_totalprice")).alias("__v"),
    )
    means = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__v").cast("decimal(38,2)")).alias("__s"),
    )
    mu = dec_double_wide_frac(F.col("__s")) / F.col("__n").cast("double")
    absdev = base.join(F.broadcast(means), "__g").select(
        "__g",
        (
            F.floor(F.abs(F.col("__v").cast("double") - mu) * 100.0).cast(
                "decimal(18,2)"
            )
            / F.lit(100)
        )
        .cast("decimal(18,2)")
        .alias("__z"),
    )
    broken = anova_oneway(absdev, "__g", "__z")
    assert _offending_blocks(broken, ["__v"]) != []
