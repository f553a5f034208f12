"""Watermarked event-time aggregations — beyond-parity streaming operators
(the reference has none: SURVEY.md section 2.9 St4). Each is the streaming twin of
a batch operator so correctness is cross-checkable between modes:

  hourly_agg        <-> operators/grouping.events_hourly
  session_agg       <-> operators/windows.sessionization

Late data: the watermark bounds state; events later than the allowance are
dropped from their window. State store size = open windows x groups — at
100 TB ingest, that (not throughput) is the scaling limit, so the watermark
allowance is the knob to watch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import dsum


def hourly_agg(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type: count, exact-decimal value
    sum, approximate distinct users (exact countDistinct is unsupported in
    streaming — approx_count_distinct is the streaming-legal analogue)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value", "total_value"),
             F.approx_count_distinct("user_id").alias("approx_users"))
        .select(F.col("win.start").alias("hour"), "event_type", "n",
                "total_value", "approx_users")
    )


def session_agg(events: DataFrame, *, gap: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    """Session windows (30-min inactivity gap) per user — the built-in
    streaming form of the batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value", "session_value"))
        .select("user_id", F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"), "n_events",
                "session_value")
    )


def sliding_rate(events: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Sliding 15-minute windows every 5 minutes: event rate per type —
    the monitoring-style overlap window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes", "5 minutes").alias("win"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )
