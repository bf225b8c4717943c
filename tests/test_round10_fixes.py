"""Round-10 ADVICE fixes: chatterjee_xi NULL-y-day rank skew,
pacf Durbin-Levinson denominator guards, logrank/KM string-ts cast."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from breweries_etl_spark.operators.behavior import (
    kaplan_meier_retention,
    logrank_retention,
)
from breweries_etl_spark.operators.temporal import (
    chatterjee_xi_daily,
    pacf_daily,
)


def test_chatterjee_all_null_day_excluded(spark):
    """ADVICE r10 #1: a day whose values are ALL NULL produced a NULL
    y group that Spark ranks NULLS FIRST but DuckDB NULLS LAST —
    inflating every Spark cumulative rank r.  The fix drops NULL-y
    days before the rank window, so the result must equal the same
    data with the degenerate day's rows removed."""
    base = [
        (f"2024-01-0{d} 12:00:00", float(v))
        for d, v in [(1, 10), (2, 5), (3, 30), (4, 2), (5, 40)]
    ]
    null_day = [("2024-01-06 12:00:00", None), ("2024-01-06 13:00:00", None)]
    schema = "ts string, value double"
    with_null = spark.createDataFrame(base + null_day, schema)
    without = spark.createDataFrame(base, schema)
    r1 = chatterjee_xi_daily(with_null).collect()[0]
    r2 = chatterjee_xi_daily(without).collect()[0]
    assert r1 == r2, "all-NULL-value day leaked into the y ranks"
    assert r1["n_days"] == 5


def test_pacf_rho1_unity_yields_null_not_inf(spark):
    """ADVICE r10 #2: rho1 rounding to ±1 made the Durbin-Levinson
    denominator (1 - rho1^2) exactly 0.  The path-graph sine
    eigenvector y_i = (-1)^i sin(i*pi/(N+1)) attains rho1 ->
    -cos(pi/(N+1)), which at N=40000 rounds to -1.000000 at 6 dp.
    pacf2/pacf3 must come back NULL, never +/-Inf or NaN."""
    n = 40000
    th = math.pi / (n + 1)
    # build (epoch-day ts, value) directly: day i -> 1970-01-01 + i days
    data = [
        (i, round(((-1) ** i) * math.sin(i * th) * 1e6, 2))
        for i in range(1, n + 1)
    ]
    df = (
        spark.createDataFrame(data, "d long, value double")
        .select(
            F.timestamp_seconds(F.col("d") * 86400).alias("ts"),
            "value",
        )
    )
    out = pacf_daily(df).collect()[0]
    assert out["n_days"] == n
    assert float(out["rho1"]) == -1.0
    assert float(out["rho2"]) == 1.0
    assert out["pacf2"] is None, f"expected NULL pacf2, got {out['pacf2']}"
    assert out["pacf3"] is None, f"expected NULL pacf3, got {out['pacf3']}"
    # and nothing NaN/Inf anywhere in the row
    for k in ("rho1", "rho2", "rho3", "pacf1", "pacf2", "pacf3"):
        v = out[k]
        if v is not None:
            assert math.isfinite(float(v)), f"{k} is {v}"


def test_logrank_and_km_accept_string_ts(spark):
    """ADVICE r10 #3: logrank_retention read unix_micros(ts) without
    the explicit cast(ts as timestamp) every sibling operator and the
    DuckDB twin (epoch_us(CAST(ts AS TIMESTAMP))) use.  A string ts
    column must parse identically to a real timestamp column."""
    rows = []
    for u in range(8):
        n_ev = 8 if u % 2 == 0 else 2  # engaged vs casual cohorts
        for e in range(n_ev):
            rows.append((f"u{u}", f"2024-01-{1 + e:02d} 00:00:0{u}"))
    as_str = spark.createDataFrame(rows, "user_id string, ts string")
    as_ts = as_str.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    for op in (logrank_retention, kaplan_meier_retention):
        r_str = [tuple(r) for r in op(as_str).collect()]
        r_ts = [tuple(r) for r in op(as_ts).collect()]
        assert r_str == r_ts, f"{op.__name__} string-ts divergence"
        assert r_str, f"{op.__name__} returned no rows"
