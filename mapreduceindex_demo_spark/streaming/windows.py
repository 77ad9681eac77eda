"""Event-time windowing (SURVEY §2.5 T4): tumbling / sliding / session
windows with watermarks over the `events` stream.

The aggregations are declared once and run identically in batch (for the
DuckDB oracle gate) and streaming (tests run them through readStream with
watermarks) — the Structured Streaming contract that batch and stream share
one API is the point. Window starts are epoch-aligned in both engines, so
the oracles use plain epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, size: str = "1 day") -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window, type)."""
    return (
        events.groupBy(F.window("ts", size).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, size: str = "1 day", slide: str = "12 hours"
) -> DataFrame:
    """Sliding windows: each event lands in size/slide overlapping windows."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: sessions close after `gap` of inactivity
    (merge rule: an event joins the session iff ts < last_ts + gap)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "cnt",
        )
    )


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Late-data bound: in streaming mode, windows finalize once event time
    passes window_end + delay; later rows are dropped (T4)."""
    return events.withWatermark("ts", delay)
