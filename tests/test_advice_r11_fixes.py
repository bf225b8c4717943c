"""Pin the round-11 ADVICE closures:

1. distance_correlation_daily overflow guard (ADVICE r11 medium):
   su2 = Σ(n²Â)² grows as n⁶·R²; past DECIMAL(38,0)/HUGEINT Spark
   (ANSI off) silently NULLs while DuckDB ERRORS — divergent failure
   modes. Both sides now apply the same exact digit-count guard
   (2 + 6·digits(n) + 2·max(digits(R_a), digits(R_b)) ≤ 38) and NULL
   the stats identically when it fails.
2. quade_test df pair (ADVICE r11 low): when every block is
   incomplete (b = 0), df2 = (b−1)(k−1) was emitted NEGATIVE;
   engine and oracle now NULL df1/df2 when b == 0.
3. The dcor docstring capacity claims (pair grid = days², U = n²Â)
   are covered by the guard test exercising the real fold.
"""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry


def _duck_events(rows):
    """DuckDB connection with an ``events`` view over literal rows
    (ts string, value double) — the only columns the dcor twin reads."""
    con = duckdb.connect()
    vals = ", ".join(f"('{ts}', {v!r})" for ts, v in rows)
    con.execute(
        f"CREATE VIEW events AS SELECT CAST(col0 AS VARCHAR) AS ts, "
        f"CAST(col1 AS DOUBLE) AS value FROM (VALUES {vals}) t(col0, col1)"
    )
    return con


def test_dcor_overflow_guard_nulls_identically(spark):
    """3 days spanning a ~9e17-cent range: digits(n)=1, digits(R)=18 →
    2+6+36 = 44 > 38, guard fails. Engine emits (3, NULL, NULL); the
    DuckDB twin returns the SAME row instead of erroring mid-fold
    (pre-fix it raised an out-of-range on HUGEINT multiplication)."""
    from breweries_etl_spark.operators.temporal import (
        distance_correlation_daily,
    )

    rows = [
        ("2024-01-01 00:00:00", 9.0e15),
        ("2024-01-02 00:00:00", 0.0),
        ("2024-01-03 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts string, value double")
    got = distance_correlation_daily(df).collect()
    assert len(got) == 1
    assert got[0]["n_days"] == 3
    assert got[0]["dcor2"] is None
    assert got[0]["dcor"] is None

    con = _duck_events(rows)
    oracle = con.execute(entry.oracle_sql()["dcor_daily_value_volume"])
    orow = oracle.fetchall()
    assert orow == [(3, None, None)]


def test_dcor_guard_passes_on_benign_data_parity(spark):
    """Small-magnitude fixture: guard passes, engine and oracle agree
    to 6 dp and the stat is non-NULL (the guard is inert in-envelope)."""
    from breweries_etl_spark.operators.temporal import (
        distance_correlation_daily,
    )

    rows = [
        ("2024-01-01 00:00:00", 10.0),
        ("2024-01-01 06:00:00", 5.0),
        ("2024-01-02 00:00:00", 30.0),
        ("2024-01-03 00:00:00", 7.0),
        ("2024-01-03 08:00:00", 7.0),
        ("2024-01-03 16:00:00", 7.0),
        ("2024-01-04 00:00:00", 50.0),
    ]
    df = spark.createDataFrame(rows, "ts string, value double")
    got = distance_correlation_daily(df).collect()[0]
    con = _duck_events(rows)
    want = con.execute(
        entry.oracle_sql()["dcor_daily_value_volume"]
    ).fetchall()[0]
    assert got["n_days"] == want[0] == 4
    assert got["dcor2"] is not None
    assert float(got["dcor2"]) == float(want[1])
    assert float(got["dcor"]) == float(want[2])


def test_quade_all_blocks_incomplete_nulls_df_pair(spark):
    """Two treatments, two blocks, each block missing one treatment:
    b = 0 complete blocks. Pre-fix df2 = −(k−1) = −1; now df1/df2 are
    NULL (engine) and the oracle twin mirrors it."""
    from breweries_etl_spark.operators.hypotests import quade_test

    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0)],
        "blk int, trt string, v double",
    )
    got = quade_test(df, "blk", "trt", "v").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_blocks"] == 0
    assert r["k_treatments"] == 2
    assert r["quade_stat"] is None
    assert r["df1"] is None
    assert r["df2"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT CAST(col0 AS BIGINT) AS c_custkey,"
        " CAST(col1 AS BIGINT) AS c_nationkey FROM (VALUES (1, 1), (2, 2))"
        " t(col0, col1)"
    )
    con.execute(
        "CREATE VIEW orders AS SELECT CAST(col0 AS BIGINT) AS o_custkey,"
        " CAST(col1 AS VARCHAR) AS o_orderpriority,"
        " CAST(col2 AS DOUBLE) AS o_totalprice"
        " FROM (VALUES (1, 'A', 10.0), (2, 'B', 20.0)) t(col0, col1, col2)"
    )
    want = con.execute(
        entry.oracle_sql()["quade_nation_priority"]
    ).fetchall()
    assert want == [(0, 2, None, None, None)]


def test_quade_complete_blocks_keep_df_pair(spark):
    """Sanity: with complete blocks the df pair is unchanged by the
    b == 0 gate (df1 = k−1, df2 = (b−1)(k−1))."""
    from breweries_etl_spark.operators.hypotests import quade_test

    df = spark.createDataFrame(
        [
            (1, "A", 1.0),
            (1, "B", 2.0),
            (2, "A", 3.0),
            (2, "B", 5.0),
            (3, "A", 2.0),
            (3, "B", 9.0),
        ],
        "blk int, trt string, v double",
    )
    r = quade_test(df, "blk", "trt", "v").collect()[0]
    assert r["n_blocks"] == 3
    assert r["df1"] == 1
    assert r["df2"] == 2
