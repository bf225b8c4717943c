"""Bin-bucketed range joins: point-in-interval and interval-overlap
joins WITHOUT an equi-key, turned into equi-joins on a time-bin column.

Why this exists: Spark plans a bare inequality join (``p.ts BETWEEN
i.start AND i.end`` with no equality conjunct) as a
BroadcastNestedLoopJoin — O(|P|·|I|) comparisons, and a hard failure
when neither side fits in a broadcast. The standard scale fix (used by
Databricks' range-join "bin" optimization and every genomics overlap
engine) is to discretize time into fixed-width bins:

* each interval is replicated to every bin it covers
  (``sequence(floor(start/w), floor(end/w))`` — cheap inline explode);
* each point belongs to exactly ONE bin (``floor(ts/w)``);
* an ordinary shuffled/broadcast **equi-join on the bin** brings only
  co-binned rows together, then the exact range predicate filters.

Correctness: a (point, interval) match is found exactly once — in the
point's bin — so no dedup pass is needed. For interval×interval overlap
both sides are replicated, so a pair could meet in several shared bins;
we emit only in the bin containing the LATER of the two starts (a bin
both sides provably cover), which makes emission exactly-once without a
``distinct()``.

Scale posture at 100 TB:

* Shuffle volume = |P| + |I|·(avg_len/w + 1). Pick ``bin_width`` near
  the typical interval length: replication factor stays O(1) while bins
  stay selective. A too-small w blows up replication; a too-large w
  degrades to per-bin mini cross products.
* The join is a plain hash equi-join on the bin key — AQE handles a hot
  bin (flash-crowd minute) via skew-join splitting; pathological cases
  add the bin-salting pattern from ``operators/merge.py``.
* No window functions, no driver collect, everything whole-stage
  codegen: the explode is ``F.explode(F.sequence(...))`` JVM-side.

The reference has no range-join operator (its joins are pandas merges
on equality keys only); this family is part of the driver-mandated
large-scale extension surface, oracled against DuckDB's native
inequality joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin(col: F.Column, width_us: int) -> F.Column:
    return F.floor(col / F.lit(width_us))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts_us",
    start: str = "start_us",
    end: str = "end_us",
    bin_width_us: int = 600_000_000,
    end_exclusive: bool = True,
) -> DataFrame:
    """Join each point (epoch-us ``point_ts``) to every interval
    [``start``, ``end``) covering it, via the bin trick above.

    Columns from both inputs are preserved (names must not collide
    except the implicit ``_bin``). Matches appear exactly once.
    """
    last_bin = _bin(F.col(end) - F.lit(1), bin_width_us) if end_exclusive else _bin(
        F.col(end), bin_width_us
    )
    ivl = intervals.withColumn(
        "_bin", F.explode(F.sequence(_bin(F.col(start), bin_width_us), last_bin))
    )
    pts = points.withColumn("_bin", _bin(F.col(point_ts), bin_width_us))
    range_pred = (F.col(point_ts) >= F.col(start)) & (
        F.col(point_ts) < F.col(end) if end_exclusive else F.col(point_ts) <= F.col(end)
    )
    return pts.join(ivl, on="_bin", how="inner").where(range_pred).drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str = "l_start_us",
    l_end: str = "l_end_us",
    r_start: str = "r_start_us",
    r_end: str = "r_end_us",
    bin_width_us: int = 1_800_000_000,
    extra_pred: F.Column | None = None,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED intervals overlap
    (``l_start <= r_end AND r_start <= l_end``), each pair emitted
    exactly once via the later-start-bin rule.

    ``extra_pred`` narrows pairs (e.g. ``user_a < user_b`` for a
    de-symmetrized self-overlap) — applied with the overlap predicate,
    after the bin equi-join.
    """
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(_bin(F.col(l_start), bin_width_us), _bin(F.col(l_end), bin_width_us))
        ),
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(_bin(F.col(r_start), bin_width_us), _bin(F.col(r_end), bin_width_us))
        ),
    )
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    # Both intervals cover the bin of max(l_start, r_start) whenever they
    # overlap, and no earlier shared bin contains it → exactly-once.
    emit_here = F.col("_bin") == _bin(F.greatest(F.col(l_start), F.col(r_start)), bin_width_us)
    pred = overlap & emit_here
    if extra_pred is not None:
        pred = pred & extra_pred
    return lb.join(rb, on="_bin", how="inner").where(pred).drop("_bin")


def error_window_coverage(events: DataFrame, window_minutes: int = 10) -> DataFrame:
    """Per error event: how many non-error events (and how much value)
    landed inside the [ts, ts+window) incident window — a global
    point-in-interval join with NO shared equi-key between the sides.

    Output: (err_id, n_covered, total_value), errors with zero coverage
    excluded (inner join), exact decimal value sums.
    """
    from ..functions.exact import money

    width_us = window_minutes * 60 * 1_000_000
    err = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + F.lit(width_us)).alias("end_us"),
    )
    pts = events.where(F.col("event_type") != "error").select(
        F.col("event_id").alias("pt_id"),
        F.col("value"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    joined = point_in_interval_join(
        pts, err, bin_width_us=width_us, end_exclusive=True
    )
    return joined.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_covered"),
        F.sum(money("value")).cast("double").alias("total_value"),
    )


def session_overlap_pairs(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Cross-user concurrent sessions: sessionize per user, then find
    every pair of sessions from DIFFERENT users whose closed time spans
    overlap — an interval×interval join with no equi-key (user ids are
    deliberately unequal). Aggregated per user pair.

    Output: (user_a, user_b, n_session_pairs, total_overlap_us) with
    user_a < user_b. Zero-length sessions (single event) participate via
    closed-interval semantics.
    """
    from .temporal import sessionize

    sessions = sessionize(events, gap_minutes=gap_minutes).select(
        "user_id", "start_us", "end_us"
    )
    left = sessions.select(
        F.col("user_id").alias("user_a"),
        F.col("start_us").alias("l_start_us"),
        F.col("end_us").alias("l_end_us"),
    )
    right = sessions.select(
        F.col("user_id").alias("user_b"),
        F.col("start_us").alias("r_start_us"),
        F.col("end_us").alias("r_end_us"),
    )
    pairs = interval_overlap_join(
        left,
        right,
        bin_width_us=1_800_000_000,
        extra_pred=F.col("user_a") < F.col("user_b"),
    )
    overlap_us = F.least(F.col("l_end_us"), F.col("r_end_us")) - F.greatest(
        F.col("l_start_us"), F.col("r_start_us")
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_session_pairs"),
        F.sum(overlap_us).alias("total_overlap_us"),
    )


def allen_relation_counts(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Allen-algebra classification of cross-user concurrent session
    pairs: among sessions whose CLOSED spans intersect, how many are
    equal / started-together / finished-together / contained / proper
    overlaps — the interval-topology profile behind "do users co-occur
    or merely brush past each other".

    Reuses the exactly-once bin-bucketed interval join
    (``interval_overlap_join``'s later-start-bin rule); classification
    is one CASE over the four endpoints; symmetric pairs are counted
    once (user_a < user_b), and the containment/overlap classes fold
    the two directions together (X during Y ≡ Y contains X —
    documented). The disjoint Allen relations (precedes/meets) are
    deliberately out of scope: they would join every pair of intervals
    regardless of distance — unbounded at corpus scale. Output per
    relation: (relation, n_pairs)."""
    from .temporal import sessionize

    sessions = sessionize(events, gap_minutes=gap_minutes).select(
        "user_id", "start_us", "end_us"
    )
    left = sessions.select(
        F.col("user_id").alias("user_a"),
        F.col("start_us").alias("l_start_us"),
        F.col("end_us").alias("l_end_us"),
    )
    right = sessions.select(
        F.col("user_id").alias("user_b"),
        F.col("start_us").alias("r_start_us"),
        F.col("end_us").alias("r_end_us"),
    )
    pairs = interval_overlap_join(
        left,
        right,
        extra_pred=F.col("user_a") < F.col("user_b"),
    )
    ls, le = F.col("l_start_us"), F.col("l_end_us")
    rs, re_ = F.col("r_start_us"), F.col("r_end_us")
    relation = (
        F.when((ls == rs) & (le == re_), F.lit("equals"))
        .when(ls == rs, F.lit("starts"))
        .when(le == re_, F.lit("finishes"))
        .when((ls < rs) & (re_ < le), F.lit("contains"))
        .when((rs < ls) & (le < re_), F.lit("contains"))
        .otherwise(F.lit("overlaps"))
    )
    return (
        pairs.select(relation.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
