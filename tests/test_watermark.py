"""Watermark semantics: in append mode, a window emits once the watermark
passes it, and events arriving after the watermark moved beyond their
window are DROPPED — the state-bounding contract that lets a 100 TB
stream hold finite aggregation state.

Spark applies LATE-EVENT filtering with the watermark of the PREVIOUS
micro-batch (one-batch lag, by design since SPARK-24634 semantics were
tightened) — hence three batches: data, watermark-carrier, late arrival.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_file(spark, src, name, rows, tmp_root):
    tmp = os.path.join(tmp_root, f"wb_{name}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], os.path.join(src, f"{name}.parquet"))


def test_late_rows_dropped_in_append_mode(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1, 0, 0)

    # batch 1: hour-0 event + hour-3 event → watermark will advance to 02:00
    _write_file(spark, src, "b1", [
        (1, t0 + dt.timedelta(minutes=10), 1.0),
        (2, t0 + dt.timedelta(hours=3), 1.0),
    ], str(tmp_path))
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    # batch 2: carrier event (hour 3) — hour-0 window evicted+emitted here
    _write_file(spark, src, "b2", [
        (4, t0 + dt.timedelta(hours=3, minutes=30), 1.0),
    ], str(tmp_path))
    time.sleep(1.1)
    # batch 3: LATE event for hour 0, behind the 02:00 watermark → dropped
    _write_file(spark, src, "b3", [
        (3, t0 + dt.timedelta(minutes=20), 100.0),
    ], str(tmp_path))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").cast("long").alias("ws"), "n", "v")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_watermark")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            s.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for s in p["stateOperators"]
        )
    finally:
        q.stop()

    out = {r["ws"]: (r["n"], r["v"]) for r in spark.table("t_watermark").collect()}
    h0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # hour-0 emitted exactly once, with ONLY the on-time event
    assert out.get(h0) == (1, 1.0)
    assert all(v != 100.0 for _n, v in out.values())
    assert dropped == 1  # the late row was discarded by the watermark
