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
STATE_SCHEMA = "n long, total double, last_us long"


def _update_profile(
    key, batches: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
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
