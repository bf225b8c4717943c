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
STATE_SCHEMA = "n long, total_cents long, last_us long"


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
    is pure IEEE arithmetic on the same double the oracle casts."""
    import numpy as np

    scaled = values.astype("float64").to_numpy() * 100.0
    cents = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    return int(cents.astype("int64").sum())


def _update_profile(
    key, batches: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += _batch_cents(pdf["value"])
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_ts_us": [last_us],
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

        n, cents, last_us = (
            self._profile.get() if self._profile.exists() else (0, 0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            cents += _batch_cents(pdf["value"])
            last_us = max(last_us, int(pdf["ts_us"].max()))
        self._profile.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "last_ts_us": [last_us],
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
