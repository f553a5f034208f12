"""Stream-stream interval join: purchases matched to same-user signups within
a bounded look-back window. Watermarks on both sides bound the join state —
without them a stream-stream join buffers forever; with them Spark evicts
rows older than (watermark - interval).

Batch twin: operators/scalar.py::interval_join_purchase_signup (same
predicate), so streaming results are cross-checkable in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def purchases_with_recent_signup(events: DataFrame, *,
                                 lookback: str = "INTERVAL 1 HOUR",
                                 watermark: str = "2 hours") -> DataFrame:
    """Each purchase joined to every signup by the same user within
    [purchase_ts - lookback, purchase_ts]."""
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    signups = (events.filter(F.col("event_type") == "signup")
               .select(F.col("user_id").alias("s_user"),
                       F.col("event_id").alias("signup_id"),
                       F.col("ts").alias("s_ts"))
               .withWatermark("s_ts", watermark))
    cond = (
        (F.col("p_user") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.expr(f"p_ts - {lookback}"))
    )
    return (purchases.join(signups, cond)
            .select(F.col("p_user").alias("user_id"), "purchase_id",
                    "signup_id", "p_ts", "s_ts"))


def purchases_with_optional_signup(events: DataFrame, *,
                                   lookback: str = "INTERVAL 1 HOUR",
                                   watermark: str = "2 hours") -> DataFrame:
    """LEFT OUTER variant: every purchase emits — joined to each same-user
    signup in the look-back window, or once with NULL signup columns after
    the watermark passes the window (the engine can only then prove no
    match will arrive). The null-emission-on-watermark behavior is the
    operational difference from the inner join: unmatched purchases whose
    window the final watermark never crosses stay in state and are NOT
    emitted — availableNow replays therefore under-report trailing
    unmatched rows by design (asserted in tests)."""
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    signups = (events.filter(F.col("event_type") == "signup")
               .select(F.col("user_id").alias("s_user"),
                       F.col("event_id").alias("signup_id"),
                       F.col("ts").alias("s_ts"))
               .withWatermark("s_ts", watermark))
    cond = (
        (F.col("p_user") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.expr(f"p_ts - {lookback}"))
    )
    return (purchases.join(signups, cond, "leftOuter")
            .select(F.col("p_user").alias("user_id"), "purchase_id",
                    "signup_id", "p_ts", "s_ts"))
