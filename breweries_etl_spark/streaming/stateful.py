"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the engine offers for operators that
windowed aggregation can't express: here, a per-user running profile
(event count, value total, last-seen timestamp) maintained across
micro-batches. State lives in the state store (RocksDB/HDFS-backed on a
cluster); a timeout would evict idle users in production.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts_us long"
# STATE SCHEMA HISTORY — the round-10 NULL-handling fix grew the state
# from 3 fields (n, total_cents, last_us) to 4 (+ n_val). Neither
# applyInPandasWithState nor transformWithState supports state-schema
# evolution: RESTARTING EITHER QUERY FROM A CHECKPOINT WRITTEN BY THE
# 3-FIELD BUILD FAILS STATE DESERIALIZATION inside the state store
# (before Python code runs, so no in-code migration is possible) — a
# schema change here REQUIRES A FRESH CHECKPOINT DIRECTORY and a
# replay/backfill of the source to rebuild state (the admission log
# pattern in dedup_stream.py makes such replays idempotent). Treat any
# future field addition the same way. (ADVICE r10 low.)
STATE_SCHEMA = "n long, total_cents long, last_us long, n_val long"


def _batch_cents(values) -> int:
    """Exact integer-cent sum of a money-scale pandas column: float
    accumulation made the state ORDER-DEPENDENT (micro-batch boundaries
    changed last-ulp totals, keeping the query rows-only); integer cents
    are associative, so the final state is independent of batching and
    SQL-replayable (decimal-sum discipline, functions/exact.py).

    Per-value rounding is HALF-UP (away from zero), matching the
    oracle's CAST(value AS DECIMAL(12,2)) in DuckDB — pandas round()
    is half-to-EVEN, so an input with >2 decimals landing on an exact
    half-cent (e.g. 0.125, whose double is exact) would diverge from
    the SQL replay by one cent (ADVICE r5). sign·floor(|v|·100 + 0.5)
    is pure IEEE arithmetic on the same double the oracle casts.

    NULL values are DROPPED before the fold (SQL SUM semantics) and the
    non-null count is returned alongside: a NaN reaching the int64 cast
    is undefined behavior in numpy and materialized as int64-min garbage
    totals the first time degenerate data hit this path (degen sweep
    r10). Returns (cents, n_nonnull)."""
    import numpy as np

    scaled = values.astype("float64").to_numpy() * 100.0
    scaled = scaled[~np.isnan(scaled)]
    cents = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    return int(cents.astype("int64").sum()), int(scaled.size)


def _update_profile(
    key, batches: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, cents, last_us, n_val = (
        state.get if state.exists else (0, 0, 0, 0)
    )
    for pdf in batches:
        n += len(pdf)
        c, nv = _batch_cents(pdf["value"])
        cents += c
        n_val += nv
        mx = pdf["ts_us"].max()  # pandas max skips NaN; all-NaN -> NaN
        if not pd.isna(mx):
            last_us = max(last_us, int(mx))
    state.update((n, cents, last_us, n_val))
    # all-NULL aggregates emit NULL exactly as the SQL replay does
    # (SUM/MAX over zero non-null inputs); last_us uses the 0 sentinel
    # for "no non-null ts yet" (event timestamps are post-1970 by
    # domain contract)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0 if n_val > 0 else None],
            "last_ts_us": [last_us if last_us > 0 else None],
        }
    )


def user_profiles_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts) -> per-user running profile rows
    emitted each micro-batch."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_profiles_once(
    spark: SparkSession, sf_dir: str, query_name: str = "user_profiles"
) -> DataFrame:
    from .events import stream_events

    out = user_profiles_stream(stream_events(spark, sf_dir))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


from pyspark.sql.streaming import StatefulProcessor


class _ProfileProcessor(StatefulProcessor):
    """Spark 4 ``StatefulProcessor`` twin of ``_update_profile``: the
    same per-user running profile on the transformWithState API, which
    adds typed state handles (value/list/map), TTL, and timers over what
    ``applyInPandasWithState`` offers. State here is one ValueState row
    per user."""

    def init(self, handle) -> None:
        self._profile = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, cents, last_us, n_val = (
            self._profile.get()
            if self._profile.exists()
            else (0, 0, 0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            c, nv = _batch_cents(pdf["value"])
            cents += c
            n_val += nv
            mx = pdf["ts_us"].max()
            if not pd.isna(mx):
                last_us = max(last_us, int(mx))
        self._profile.update((n, cents, last_us, n_val))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0 if n_val > 0 else None],
                "last_ts_us": [last_us if last_us > 0 else None],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas speaks protobuf between the JVM state
    server and the Python worker; the container may not ship
    google.protobuf. Import-gated per environment policy."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_profiles_stream_tws(events: DataFrame) -> DataFrame:
    """``user_profiles_stream`` on ``transformWithStateInPandas`` — the
    current-generation arbitrary-state operator API (RocksDB-backed state
    with TTL/timers on a cluster). Identical output contract, so the two
    APIs share their comparison tests.

    Requires the protobuf runtime (see ``tws_available``); raises
    ImportError eagerly instead of crashing the streaming worker
    mid-query."""
    from pyspark.sql import functions as F

    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf, which is "
            "not installed; use user_profiles_stream (applyInPandasWithState)"
        )

    prepared = events.select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_ProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_user_profiles_tws_once(
    spark: SparkSession, sf_dir: str, query_name: str = "user_profiles_tws"
) -> DataFrame:
    from .events import stream_events

    out = user_profiles_stream_tws(stream_events(spark, sf_dir))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
