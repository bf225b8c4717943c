"""Round-12 wave 22: Siegel–Tukey zig-zag dispersion ranks, Conover
squared-ranks variance test, Watson's U² circular uniformity,
Epps–Pulley characteristic-function normality, Friedman aligned ranks
— every golden value regenerated from an independent plain-Python
implementation of the published procedure (Siegel & Tukey 1960 incl.
the middle-takes-N odd pattern; Conover 1999 §5.3 linear-rank moments
over R²; Watson 1961 via the textbook Σ(u_(i) − (2i−1)/2n)² form;
Epps–Pulley 1983 / BHEP(β=1); Hodges & Lehmann 1962 aligned ranks per
García et al. 2010) — written in the r12 session BEFORE the oracles,
per the standing from-the-paper discipline."""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F


def _st_ranks(n):
    r = {}
    half = n // 2
    for p in range(1, n + 1):
        if p <= half:
            r[p] = 2 * p - (p % 2)
        elif n % 2 == 1 and p == half + 1:
            r[p] = n
        else:
            q = n + 1 - p
            r[p] = 2 * q - 1 + (q % 2)
    return r


def _st_ref(rows):
    pooled = sorted(rows, key=lambda t: t[0])
    n = len(pooled)
    rk = _st_ranks(n)
    assert sorted(rk.values()) == list(range(1, n + 1))
    byval = defaultdict(list)
    for i, (v, _) in enumerate(pooled, 1):
        byval[v].append(i)
    score = {v: sum(rk[p] for p in ps) / len(ps) for v, ps in byval.items()}
    w = sum(score[v] for v, g in rows if g == "A")
    na = sum(1 for _, g in rows if g == "A")
    nb = n - na
    allsc = [score[v] for v, _ in rows]
    sa, saa = sum(allsc), sum(s * s for s in allsc)
    var = na * nb * (n * saa - sa * sa) / (n * n * (n - 1))
    return w, (w - na * sa / n) / math.sqrt(var), na, nb


def _mk_two_sample():
    rnd = random.Random(42)
    xa = [round(rnd.gauss(50, 3), 2) for _ in range(40)]
    xb = [round(rnd.gauss(50, 12), 2) for _ in range(35)]
    return xa, xb, [(v, "A") for v in xa] + [(v, "B") for v in xb]


def test_siegel_tukey_matches_paper_pattern(spark):
    from breweries_etl_spark.operators.hypotests import siegel_tukey

    _, _, rows = _mk_two_sample()
    w, z, na, nb = _st_ref(rows)
    df = spark.createDataFrame(rows, "v double, g string")
    got = siegel_tukey(df, "v", F.col("g") == "A").collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert float(got["st_stat"]) == pytest.approx(w, abs=1e-4)
    assert float(got["z_score"]) == pytest.approx(z, abs=2e-5)
    # wide sample collects LOW ranks -> narrow A-sample z is positive
    assert float(got["z_score"]) > 3


def test_siegel_tukey_odd_n_and_ties(spark):
    """Odd N exercises the middle-takes-rank-N branch; rounding to
    integers forces midrank tie blocks spanning both rank parities."""
    from breweries_etl_spark.operators.hypotests import siegel_tukey

    _, _, rows = _mk_two_sample()
    for variant in (rows[:-2], [(round(v, 0), g) for v, g in rows]):
        w, z, *_ = _st_ref(variant)
        df = spark.createDataFrame(variant, "v double, g string")
        got = siegel_tukey(df, "v", F.col("g") == "A").collect()[0]
        assert float(got["st_stat"]) == pytest.approx(w, abs=1e-3)
        assert float(got["z_score"]) == pytest.approx(z, abs=2e-5)


def test_siegel_tukey_score_sum_invariant(spark):
    """The zig-zag scores are a permutation of 1..N, so the pooled
    score total must be EXACTLY N(N+1)/2 — W_A + W_B == that."""
    from breweries_etl_spark.operators.hypotests import siegel_tukey

    _, _, rows = _mk_two_sample()
    df = spark.createDataFrame(rows, "v double, g string")
    wa = float(
        siegel_tukey(df, "v", F.col("g") == "A").collect()[0]["st_stat"]
    )
    wb = float(
        siegel_tukey(df, "v", F.col("g") == "B").collect()[0]["st_stat"]
    )
    n = len(rows)
    assert wa + wb == pytest.approx(n * (n + 1) / 2, abs=1e-3)


def test_conover_squared_ranks_matches_naive(spark):
    from breweries_etl_spark.operators.hypotests import (
        conover_squared_ranks,
    )

    xa, xb, rows = _mk_two_sample()
    ma, mb = sum(xa) / len(xa), sum(xb) / len(xb)
    devs = [(math.floor(abs(v - ma) * 100), "A") for v in xa] + [
        (math.floor(abs(v - mb) * 100), "B") for v in xb
    ]
    sd = sorted(devs, key=lambda t: t[0])
    byu = defaultdict(list)
    for i, (u, _) in enumerate(sd, 1):
        byu[u].append(i)
    mid = {u: sum(ps) / len(ps) for u, ps in byu.items()}
    t_ref = sum(mid[u] ** 2 for u, g in devs if g == "A")
    alls = [mid[u] ** 2 for u, _ in devs]
    sa, saa = sum(alls), sum(s * s for s in alls)
    n, na, nb = len(rows), len(xa), len(xb)
    var = na * nb * (n * saa - sa * sa) / (n * n * (n - 1))
    z_ref = (t_ref - na * sa / n) / math.sqrt(var)

    df = spark.createDataFrame(rows, "v double, g string")
    got = conover_squared_ranks(df, "v", F.col("g") == "A").collect()[0]
    assert float(got["t_stat"]) == pytest.approx(t_ref, abs=1e-3)
    assert float(got["z_score"]) == pytest.approx(z_ref, abs=2e-5)
    # narrow sample's deviations rank LOW -> negative z
    assert float(got["z_score"]) < -3


def test_watson_u2_matches_textbook(spark):
    from breweries_etl_spark.operators.temporal import watson_u2_minute

    rows = [
        ("2024-01-0%d %02d:%02d:00" % (1 + (i % 3), (7 * i) % 24, (13 * i) % 60),)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts string")
    got = watson_u2_minute(df).collect()[0]
    mins = sorted(
        int(ts[11:13]) * 60 + int(ts[14:16]) for (ts,) in rows
    )
    n = len(mins)
    us = [m / 1440.0 for m in mins]
    ub = sum(us) / n
    u2 = (
        sum((u - (2 * i - 1) / (2 * n)) ** 2 for i, u in enumerate(us, 1))
        - n * (ub - 0.5) ** 2
        + 1 / (12 * n)
    )
    assert got["n"] == n
    assert float(got["u2_stat"]) == pytest.approx(u2, abs=2e-6)


def test_watson_u2_rotation_invariance(spark):
    """The Watson statistic is invariant to rotating the circle — the
    whole point vs linear CvM. Shift every event by +7h (mod 24) and
    the statistic must not move."""
    from breweries_etl_spark.operators.temporal import watson_u2_minute

    base = [(h, m) for h in (1, 5, 6, 11, 22) for m in (0, 17, 45)] * 4
    rows = [("2024-03-01 %02d:%02d:00" % hm,) for hm in base]
    shifted = [
        ("2024-03-01 %02d:%02d:00" % ((h + 7) % 24, m),) for h, m in base
    ]
    u1 = watson_u2_minute(
        spark.createDataFrame(rows, "ts string")
    ).collect()[0]["u2_stat"]
    u2 = watson_u2_minute(
        spark.createDataFrame(shifted, "ts string")
    ).collect()[0]["u2_stat"]
    assert float(u1) == pytest.approx(float(u2), abs=1e-6)


def test_epps_pulley_matches_textbook(spark):
    from breweries_etl_spark.operators.temporal import epps_pulley_daily

    vals = [10.0, 12.5, 9.0, 30.0, 11.0, 14.0, 8.5, 100.0, 13.0, 12.0]
    rows = [("2024-02-%02d 05:00:00" % (i + 1), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts string, value double")
    got = epps_pulley_daily(df).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    s = math.sqrt(sum((x - mean) ** 2 for x in vals) / n)
    ys = [(x - mean) / s for x in vals]
    tep = (
        sum(math.exp(-((a - b) ** 2) / 2) for a in ys for b in ys) / n
        - math.sqrt(2) * sum(math.exp(-y * y / 4) for y in ys)
        + n / math.sqrt(3)
    )
    assert got["n_days"] == n
    assert float(got["tep_stat"]) == pytest.approx(tep, abs=5e-6)


def test_epps_pulley_degenerate_inputs(spark):
    """Constant series (zero variance) and empty input both emit the
    1-row NULL-stat anchor."""
    from breweries_etl_spark.operators.temporal import epps_pulley_daily

    const = spark.createDataFrame(
        [("2024-02-0%d 05:00:00" % d, 7.0) for d in range(1, 6)],
        "ts string, value double",
    )
    r = epps_pulley_daily(const).collect()
    assert len(r) == 1 and r[0]["n_days"] == 5 and r[0]["tep_stat"] is None
    empty = spark.createDataFrame([], "ts string, value double")
    r2 = epps_pulley_daily(empty).collect()
    assert len(r2) == 1 and r2[0]["n_days"] == 0 and r2[0]["tep_stat"] is None


def test_aligned_ranks_matches_naive(spark):
    from breweries_etl_spark.operators.hypotests import (
        friedman_aligned_ranks,
    )

    rnd = random.Random(7)
    cells = {}
    for b in range(1, 9):
        for t in ("t1", "t2", "t3"):
            cells[(b, t)] = round(
                rnd.uniform(10, 100) + (5 if t == "t2" else 0), 2
            )
    rows = [(b, t, v) for (b, t), v in cells.items()]
    df = spark.createDataFrame(rows, "blk int, trt string, v double")
    k, blocks = 3, sorted({b for b, _ in cells})
    bn = len(blocks)
    al = {
        (b, t): cells[(b, t)]
        - sum(cells[(b, tt)] for tt in ("t1", "t2", "t3")) / k
        for b, t in cells
    }
    sa = sorted(al.items(), key=lambda kv: kv[1])
    byv = defaultdict(list)
    for i, ((b, t), v) in enumerate(sa, 1):
        byv[round(v, 9)].append(i)
    midr = {v: sum(ps) / len(ps) for v, ps in byv.items()}
    r = {(b, t): midr[round(al[(b, t)], 9)] for b, t in al}
    rt = {t: sum(r[(b, t)] for b in blocks) for t in ("t1", "t2", "t3")}
    rb = {b: sum(r[(b, t)] for t in ("t1", "t2", "t3")) for b in blocks}
    n = k * bn
    t_ref = (
        (k - 1)
        * (sum(v * v for v in rt.values()) - (k * bn * bn / 4) * (n + 1) ** 2)
    ) / (n * (n + 1) * (2 * n + 1) / 6 - (1 / k) * sum(v * v for v in rb.values()))
    got = friedman_aligned_ranks(df, "blk", "trt", "v").collect()[0]
    assert (got["n_blocks"], got["k_treatments"], got["df"]) == (bn, k, 2)
    assert float(got["aligned_stat"]) == pytest.approx(t_ref, abs=2e-5)


def test_aligned_ranks_degenerate_blocks(spark):
    """Single treatment -> anchor row; all blocks incomplete -> b = 0
    with NULL stat and NULL df (the quade b == 0 convention)."""
    from breweries_etl_spark.operators.hypotests import (
        friedman_aligned_ranks,
    )

    one = spark.createDataFrame(
        [(1, "only", 5.0), (2, "only", 6.0)], "blk int, trt string, v double"
    )
    r = friedman_aligned_ranks(one, "blk", "trt", "v").collect()[0]
    assert (r["n_blocks"], r["k_treatments"]) == (0, 1)
    assert r["aligned_stat"] is None and r["df"] is None

    incomplete = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 6.0)], "blk int, trt string, v double"
    )
    r2 = friedman_aligned_ranks(incomplete, "blk", "trt", "v").collect()[0]
    assert (r2["n_blocks"], r2["k_treatments"]) == (0, 2)
    assert r2["aligned_stat"] is None and r2["df"] is None
