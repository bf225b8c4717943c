"""Round-12 independent-reference RE-AUDIT of the round-11 wave
(VERDICT r11 next-round #2/#4): generalized_esd, hill_diversity,
quade, snht, dcor, each re-derived HERE from the published procedure —
Rosner 1983, Jost 2006, Conover 1999, Alexandersson 1986,
Székely-Rizzo-Bakirov 2007 — in plain Python (floats / Fractions,
textbook formulas, NO reuse of the operators' integer-fold algebra),
then compared against the engine ON THE REAL sf0.001 TABLES. This is
the standing "re-derive last round's wave from the paper" discipline
that caught the dagostino centering bug in r11.

Input preparation (day bucketing, half-up cent quantization) is the
shared data contract and is replicated verbatim; everything AFTER the
prepared values is derived only from the papers.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _cents(v: float) -> int:
    """Half-up cent quantization of a double, sign-aware — the engine's
    quantized_money contract (input prep, not statistic math)."""
    return (-1 if v < 0 else 1) * int(math.floor(abs(v) * 100 + 0.5))


def _daily(sf: str):
    """(day, total_cents, count) for the events daily series; the cast
    double→DECIMAL(18,2) is BigDecimal.valueOf + HALF_UP, mirrored via
    Decimal(repr(v))."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,"
        f" value FROM read_parquet('{sf}/events.parquet')"
        f" WHERE value IS NOT NULL AND ts IS NOT NULL"
    ).fetchall()
    agg: dict[int, list[int]] = {}
    for day, v in rows:
        c = int(
            (Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP))
            * 100
        )
        if day not in agg:
            agg[day] = [0, 0]
        agg[day][0] += c
        agg[day][1] += 1
    return sorted((d, c, m) for d, (c, m) in agg.items())


def test_reaudit_generalized_esd_rosner1983(spark):
    """Rosner's generalized ESD: each round i computes
    R_i = max|x − x̄|/s over the REMAINING sample (sample sd, n−1) and
    removes that point; documented max-end tie-break. Naive Python
    recompute vs engine on orders.o_totalprice at sf0.001."""
    con = duckdb.connect()
    xs = [
        _cents(v)
        for (v,) in con.execute(
            f"SELECT o_totalprice FROM read_parquet('{SF}/orders.parquet')"
            f" WHERE o_totalprice IS NOT NULL"
        ).fetchall()
    ]
    expect = []
    for rnd in range(1, 4):
        n = len(xs)
        if n < 3:
            break
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        if var <= 0:
            break
        s = math.sqrt(var)
        hi, lo = max(xs), min(xs)
        # engine tie-break: |max·n − S| >= |min·n − S| → max end
        sm = sum(xs)
        victim = hi if abs(hi * n - sm) >= abs(lo * n - sm) else lo
        r = abs(victim - mean) / s
        expect.append((rnd, n, victim / 100.0, r))
        xs.remove(victim)

    got = [
        (r["round"], r["n_before"], r["removed_value"], r["r_stat"])
        for r in sorted(
            entry.queries()["generalized_esd_orders"](spark, SF).collect(),
            key=lambda r: r["round"],
        )
    ]
    assert len(got) == len(expect) == 3
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1]
        assert float(g[2]) == pytest.approx(e[2], abs=0.005)
        assert float(g[3]) == pytest.approx(e[3], abs=2e-6)


def test_reaudit_hill_numbers_jost2006(spark):
    """Jost 2006 Hill numbers over documents.source at sf0.001:
    ⁰D = k, ¹D = exp(−Σ p·ln p), ²D = 1/Σp², ^∞D = 1/max p — all from
    raw float p_i, no integer-ratio shortcut. The engine folds H from
    6-dp-rounded per-category terms (documented MI recipe), so ¹D
    carries a ≤ k·5e-7 perturbation ON H, i.e. ≤ D1·k·5e-7 ≈ 2e-4 on
    D1 at the sf0.001 mix (k = 20) — the d1 tolerance is that
    envelope, observed deviation 1.6e-4."""
    con = duckdb.connect()
    counts: dict[object, int] = {}
    for (s,) in con.execute(
        f"SELECT source FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall():
        counts[s] = counts.get(s, 0) + 1
    n = sum(counts.values())
    ps = [c / n for c in counts.values()]
    d0 = len(ps)
    d1 = math.exp(-sum(p * math.log(p) for p in ps))
    d2 = 1.0 / sum(p * p for p in ps)
    dinf = 1.0 / max(ps)

    r = entry.queries()["hill_diversity_docs"](spark, SF).collect()[0]
    assert r["n_rows"] == n
    assert r["hill_d0"] == d0
    assert float(r["hill_d1"]) == pytest.approx(d1, abs=d1 * d0 * 5e-7)
    assert float(r["hill_d2"]) == pytest.approx(d2, abs=2e-6)
    assert float(r["hill_dinf"]) == pytest.approx(dinf, abs=2e-6)


def test_reaudit_quade_conover1999(spark):
    """Conover (1999, §5.8) Quade test with textbook float midranks:
    R_ij within-block average ranks, Q_i = average ranks of block
    ranges, S_ij = Q_i·(R_ij − (k+1)/2), A = ΣS², B = ΣS_j²/b,
    F = (b−1)B/(A−B), df = (k−1, (b−1)(k−1)). Cell responses are the
    exact cent sums per (nation, priority); incomplete blocks dropped
    (the engine's documented convention)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT c.c_nationkey, o.o_orderpriority, o.o_totalprice"
        f" FROM read_parquet('{SF}/orders.parquet') o"
        f" JOIN read_parquet('{SF}/customer.parquet') c"
        f" ON o.o_custkey = c.c_custkey"
        f" WHERE c.c_nationkey IS NOT NULL AND o.o_orderpriority IS NOT NULL"
        f" AND o.o_totalprice IS NOT NULL"
    ).fetchall()
    cells: dict[tuple, int] = {}
    for blk, trt, v in rows:
        cells[(blk, trt)] = cells.get((blk, trt), 0) + _cents(v)
    k = len({t for _, t in cells})
    blocks = sorted({b for b, _ in cells})
    complete = [
        b for b in blocks if sum(1 for bb, _ in cells if bb == b) == k
    ]
    b = len(complete)
    assert b > 1, "fixture sanity: need complete blocks at sf0.001"

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2 + 1
            for t in range(i, j + 1):
                out[order[t]] = mr
            i = j + 1
        return out

    trts = sorted({t for _, t in cells})
    rk: dict[tuple, float] = {}
    rng = []
    for blk in complete:
        ys = [cells[(blk, t)] for t in trts]
        for t, m in zip(trts, midranks(ys)):
            rk[(blk, t)] = m
        rng.append(max(ys) - min(ys))
    q = midranks(rng)
    s_ij = {
        (blk, t): q[i] * (rk[(blk, t)] - (k + 1) / 2)
        for i, blk in enumerate(complete)
        for t in trts
    }
    a_stat = sum(s * s for s in s_ij.values())
    sj = {t: sum(s_ij[(blk, t)] for blk in complete) for t in trts}
    b_stat = sum(s * s for s in sj.values()) / b
    f_stat = (b - 1) * b_stat / (a_stat - b_stat)

    r = entry.queries()["quade_nation_priority"](spark, SF).collect()[0]
    assert r["n_blocks"] == b
    assert r["k_treatments"] == k
    assert float(r["quade_stat"]) == pytest.approx(f_stat, abs=2e-6)
    assert r["df1"] == k - 1
    assert r["df2"] == (b - 1) * (k - 1)


def test_reaudit_snht_alexandersson1986(spark):
    """Alexandersson's SNHT from the standardized means directly:
    T_k = k·z̄₁² + (n−k)·z̄₂² with z̄ = (prefix/suffix mean − x̄)/s,
    s the POPULATION sd; max over k = 1..n−1, earliest day on a
    floor(1e9·T) fixed-point tie. No use of the engine's single-
    numerator identity."""
    daily = _daily(SF)
    n = len(daily)
    xs = [c for _, c, _ in daily]
    mean = sum(xs) / n
    s = math.sqrt(sum((x - mean) ** 2 for x in xs) / n)
    best = None
    cum = 0
    for kk in range(1, n):
        cum += xs[kk - 1]
        z1 = (cum / kk - mean) / s
        z2 = ((sum(xs) - cum) / (n - kk) - mean) / s
        t = kk * z1 * z1 + (n - kk) * z2 * z2
        key = math.floor(t * 1e9)
        if best is None or key > best[0]:
            best = (key, daily[kk - 1][0], t)
    r = entry.queries()["snht_daily_value"](spark, SF).collect()[0]
    assert r["n_days"] == n
    assert r["change_day"] == best[1]
    assert float(r["t_stat"]) == pytest.approx(best[2], abs=2e-6)


def test_reaudit_dcor_szekely2007(spark):
    """Székely–Rizzo–Bakirov 2007 distance correlation, textbook
    double-centering over the daily (value, count) series with EXACT
    Fractions: Â_jk = a_jk − ā_j· − ā·_k + ā··, dCov² = (1/n²)ΣÂB̂,
    dCor² = dCov²/√(dVar_x·dVar_y). Independent of the engine's
    n⁶-cancelling integer fold."""
    daily = _daily(SF)
    n = len(daily)
    ys = [c for _, c, _ in daily]
    ms = [m for _, _, m in daily]

    def centered(v):
        a = [[abs(v[i] - v[j]) for j in range(n)] for i in range(n)]
        rbar = [Fraction(sum(row), n) for row in a]
        gbar = Fraction(sum(sum(row) for row in a), n * n)
        return [
            [Fraction(a[i][j]) - rbar[i] - rbar[j] + gbar for j in range(n)]
            for i in range(n)
        ]

    A, B = centered(ys), centered(ms)
    dcov2 = sum(A[i][j] * B[i][j] for i in range(n) for j in range(n)) / (
        n * n
    )
    dvarx = sum(A[i][j] ** 2 for i in range(n) for j in range(n)) / (n * n)
    dvary = sum(B[i][j] ** 2 for i in range(n) for j in range(n)) / (n * n)
    dcor2 = float(dcov2) / math.sqrt(float(dvarx) * float(dvary))

    r = entry.queries()["dcor_daily_value_volume"](spark, SF).collect()[0]
    assert r["n_days"] == n
    assert float(r["dcor2"]) == pytest.approx(dcor2, abs=2e-6)
    assert float(r["dcor"]) == pytest.approx(math.sqrt(dcor2), abs=2e-6)


def test_snht_exact_tie_takes_earliest_day_engine_and_oracle(spark):
    """Closing-sequence audit item (VERDICT r11 #4): a palindromic
    series makes T_1 == T_3 EXACTLY (floor(1e9·T) identical); the
    documented tie rule picks the EARLIEST day on both engines."""
    from breweries_etl_spark.operators.temporal import snht_daily_value

    rows = [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-02 00:00:00", 5.0),
        ("2024-01-03 00:00:00", 5.0),
        ("2024-01-04 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts string, value double")
    r = snht_daily_value(df).collect()[0]
    day0 = 19723  # 2024-01-01
    assert r["n_days"] == 4
    assert r["change_day"] == day0

    con = duckdb.connect()
    vals = ", ".join(f"('{ts}', {v!r})" for ts, v in rows)
    con.execute(
        f"CREATE VIEW events AS SELECT CAST(col0 AS VARCHAR) AS ts,"
        f" CAST(col1 AS DOUBLE) AS value FROM (VALUES {vals}) t(col0, col1)"
    )
    want = con.execute(entry.oracle_sql()["snht_daily_value"]).fetchall()
    assert want[0][2] == day0
    assert float(want[0][1]) == pytest.approx(float(r["t_stat"]), abs=1e-9)


def test_dcor_calendar_extremes_parity(spark):
    """Closing-sequence audit item (VERDICT r11 #4): the degen
    generator's date extremes — pre-epoch (negative day index) and
    far-future days in ONE series. The pair grid stays |days|² (4 days
    → 16 pairs regardless of span), day signs never enter the fold
    (only yc/m distances do), and engine == oracle exactly."""
    from breweries_etl_spark.operators.temporal import (
        distance_correlation_daily,
    )

    rows = [
        ("1900-01-15 12:00:00", 10.0),
        ("1969-12-31 23:00:00", 25.0),
        ("2024-06-01 00:00:00", 11.0),
        ("2024-06-01 08:00:00", 2.0),
        ("2200-02-28 00:00:00", 40.0),
    ]
    df = spark.createDataFrame(rows, "ts string, value double")
    r = distance_correlation_daily(df).collect()[0]
    assert r["n_days"] == 4
    assert r["dcor2"] is not None

    con = _duck_events_view(rows)
    want = con.execute(
        entry.oracle_sql()["dcor_daily_value_volume"]
    ).fetchall()[0]
    assert want[0] == 4
    assert float(r["dcor2"]) == float(want[1])
    assert float(r["dcor"]) == float(want[2])


def _duck_events_view(rows):
    con = duckdb.connect()
    vals = ", ".join(f"('{ts}', {v!r})" for ts, v in rows)
    con.execute(
        f"CREATE VIEW events AS SELECT CAST(col0 AS VARCHAR) AS ts,"
        f" CAST(col1 AS DOUBLE) AS value FROM (VALUES {vals}) t(col0, col1)"
    )
    return con
