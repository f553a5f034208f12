"""Incrementally-maintained ordered funnel state — the foreachBatch
transform behind funnel_stream_replay (operators/funnel_stream.py).

State: one row per user, (t1, t2, t3) = the converting timestamps of
view -> click-after-view -> purchase-after-click, exactly the
strictly-ordered chaining of the batch funnel (events12.py).

Exactness contract, stated precisely: the merge is exact when batches
arrive in EVENT-TIME order (each batch's events all later than the
previous batch's — the replay's fixed time cuts, or a watermarked stream
that emits closed windows). Under that ordering t1 can never decrease
after being set, so chaining new events against the merged t1/t2 is the
same computation the from-scratch funnel does. Under arbitrary
out-of-order arrival a 3-timestamp state is NOT sufficient (an earlier
view arriving late re-qualifies clicks that were discarded); the
engine-correct handling is the same as streaming dedup's: hold per-step
candidate events inside the watermark, fold them only when the window
closes.

Scale stance: per batch, three per-user min-aggregates over the BATCH
(map-side combinable, batch-sized) and one full-outer merge join against
the O(users) state, followed by an eager localCheckpoint that truncates
lineage so batch k never re-runs batches 1..k-1 (the ivm_sink
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_SCHEMA = ("user_id bigint, t1 timestamp_ntz, t2 timestamp_ntz, "
           "t3 timestamp_ntz")


def empty_funnel_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], _SCHEMA)


def merge_funnel(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold one event batch into the funnel state (module docstring has
    the event-time-ordering exactness contract)."""
    bv = (batch.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("bt1")))
    # least(NULL, x) is NULL, so coalesce(least, old, new) = min-or-set.
    s1 = (state.join(bv, "user_id", "full_outer")
          .select("user_id",
                  F.coalesce(F.least("t1", "bt1"), F.col("t1"),
                             F.col("bt1")).alias("t1"),
                  "t2", "t3"))
    bc = (batch.filter(F.col("event_type") == "click")
          .select("user_id", F.col("ts").alias("cts")))
    b2 = (s1.filter(F.col("t1").isNotNull())
          .join(bc, "user_id")
          .filter(F.col("cts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("cts").alias("bt2")))
    s2 = (s1.join(b2, "user_id", "left_outer")
          .select("user_id", "t1",
                  F.coalesce(F.least("t2", "bt2"), F.col("t2"),
                             F.col("bt2")).alias("t2"),
                  "t3"))
    bp = (batch.filter(F.col("event_type") == "purchase")
          .select("user_id", F.col("ts").alias("pts")))
    b3 = (s2.filter(F.col("t2").isNotNull())
          .join(bp, "user_id")
          .filter(F.col("pts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("pts").alias("bt3")))
    out = (s2.join(b3, "user_id", "left_outer")
           .select("user_id", "t1", "t2",
                   F.coalesce(F.least("t3", "bt3"), F.col("t3"),
                              F.col("bt3")).alias("t3")))
    return out.localCheckpoint(eager=True)


def funnel_counts(state: DataFrame) -> DataFrame:
    """(n_view, n_click_after_view, n_purchase_after_click) of a state."""
    return state.agg(
        F.count("t1").cast("long").alias("n_view"),
        F.count("t2").cast("long").alias("n_click_after_view"),
        F.count("t3").cast("long").alias("n_purchase_after_click"))
