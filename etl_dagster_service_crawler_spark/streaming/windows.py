"""Streaming window aggregations (tumbling / sliding / session).

These are the streaming counterparts of the reference's per-2-minute
crawl-rate telemetry (definitions.py:35) — windowed counts/sums over
the event-time column with watermarked late-data handling.

Each builder takes the (streaming or batch) events frame; the same
code path serves both because window()/session_window() are plan
nodes, not stream-only features — that is what makes the
batch-equivalence oracle checks valid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.compat import dsum


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-window, per-type count + value sum."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), dsum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
        )
    )


def session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows (gap-based): start, #events."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "cnt",
        )
    )


def stream_stream_join(
    purchases: DataFrame, errors: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to error events of
    the same user within [purchase_ts, purchase_ts + within). Both sides
    carry watermarks so join state is bounded — Spark buffers only rows
    younger than the watermark horizon on each side.

    Time-bound + equality predicate is mandatory: without the time
    range, state would grow forever; without the key, it's a stateful
    cross join."""
    p = (
        purchases.withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    e = (
        errors.withWatermark("ts", "30 minutes")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_ts"),
        )
    )
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") < F.col("p_ts") + F.expr(f"INTERVAL {within}"))
    )
    return p.join(e, cond).select("purchase_id", "error_id", "p_user")


def watermarked_tumbling(events: DataFrame, width: str = "1 hour",
                         late: str = "30 minutes") -> DataFrame:
    """Tumbling counts with a watermark — append-mode capable: state for
    a window is dropped once event time passes window end + late."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )
