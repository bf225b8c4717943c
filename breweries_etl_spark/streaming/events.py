"""Structured Streaming twins of the batch temporal operators.

The reference is batch-only (@daily full refresh, SURVEY.md §2.10); these
give the engine the streaming surface a scale deployment needs: the same
tumbling aggregation expressed over ``readStream``, with a watermark for
late data and state cleanup. In production the source line changes to
Kafka/files-on-arrival; the aggregation plan is identical.

For tests/oracle runs, ``run_tumbling_once`` drives the stream over the
static events parquet with a memory sink and ``processAllAvailable`` —
the result must equal the batch operator on the same data (and the
driver's DuckDB oracle for it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import money

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The streaming file source needs an explicit schema; take it from a
    # static read of the same file so the stream tracks whatever encoding
    # the current testdata generation uses (nanos-as-long / NTZ / plain
    # timestamp), then normalize exactly like the batch loader.
    from ..sources.tables import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    )
    # The streaming file source wants a DIRECTORY; point it at sf_dir and
    # glob-filter to the events file.
    raw = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def streaming_tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling aggregation — identical plan shape to
    temporal.tumbling_counts; the watermark bounds state so a year-long
    stream holds only ~watermark/width windows per key in memory."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window twin of temporal.sliding_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def write_stream_foreach_batch(
    df: DataFrame, out_dir: str, query_name: str = "foreach_batch_sink"
):
    """Exactly-once-style sink: each micro-batch lands as an idempotent
    per-epoch parquet directory (rerunning an epoch overwrites the same
    path instead of duplicating — the standard foreachBatch pattern when
    a transactional sink isn't available)."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        df.writeStream.outputMode("append")
        .foreachBatch(write_epoch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id: state holds ids only within the
    watermark horizon (``dropDuplicatesWithinWatermark``), so a replayed
    or at-least-once source can't double-count while state stays bounded
    — the streaming twin of operators/dedup.dedup_exact."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def streaming_session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked streaming sessionization with native ``session_window``
    — the streaming twin of temporal.session_window_agg. Spark merges
    session state incrementally as events arrive; the watermark lets the
    engine finalize (and drop) sessions whose gap has provably expired,
    so state is bounded by the active-session count, not stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts"))).alias("end_us"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select("user_id", "n_events", "start_us", "end_us", "total_value")
    )


def _run_complete_once(agg: DataFrame, spark: SparkSession, query_name: str) -> DataFrame:
    """Drive a streaming aggregation to completion over a static source
    (memory sink, complete mode) and return the result as a batch frame."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_sliding_once(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_sliding"
) -> DataFrame:
    return _run_complete_once(
        streaming_sliding_counts(stream_events(spark, sf_dir)), spark, query_name
    )


def run_session_window_once(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_session"
) -> DataFrame:
    return _run_complete_once(
        streaming_session_window_agg(stream_events(spark, sf_dir)), spark, query_name
    )


def run_tumbling_once(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_tumbling"
) -> DataFrame:
    """Drive the streaming aggregation to completion over the static
    events table (memory sink, complete mode) and return the result as a
    batch DataFrame."""
    return _run_complete_once(
        streaming_tumbling_counts(stream_events(spark, sf_dir)), spark, query_name
    )


def streaming_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join with an event-time range: each purchase
    matches the same user's clicks in the preceding ``max_gap``. Both
    sides carry watermarks and the join condition bounds event time in
    BOTH directions, so Spark can size and expire the join state — the
    unbounded-state trap of stream-stream joins is structurally avoided.
    Attribution joins (click → conversion) are exactly this shape."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")
        ),
    ).select(
        "click_id",
        "purchase_id",
        F.col("p_user").alias("user_id"),
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("gap_seconds"),
    )


def run_click_attribution_once(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_attribution"
) -> DataFrame:
    """Drive the stream-stream join to completion over the static events
    table (append mode — inner interval joins emit matches as they
    arrive) and return the result as a batch DataFrame."""
    events = stream_events(spark, sf_dir)
    joined = streaming_click_purchase_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_streaming_dedup_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery drill: the events stream unioned with a
    second read of itself (every record delivered twice), pushed through
    ``streaming_dedup`` — the per-type counts must equal the clean batch
    aggregate, proving the dedup state absorbs the replay. Append-mode
    memory sink: dropDuplicatesWithinWatermark emits first occurrences
    immediately (the watermark only bounds state), so a finite source
    drains completely.
    """
    dup = stream_events(spark, sf_dir).unionByName(stream_events(spark, sf_dir))
    q = (
        streaming_dedup(dup)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_drill")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table("dedup_drill")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )
