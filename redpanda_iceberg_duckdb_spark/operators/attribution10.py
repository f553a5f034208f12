"""Position-based (U-shaped) multi-touch attribution — credit each
user's first purchase across the touch events that preceded it: 40% to
the first touch, 40% to the last, 20% split over the middles (100% /
50-50 for 1- and 2-touch paths). The marketing-analytics sibling of the
repo's funnel/sessionization tier: "which activity stream gets credit
for conversions" as one aggregatable query.

Exactness. Credits ride as integer NANO-credits (1e9 = one conversion):
400_000_000 / 400_000_000 / floor(200_000_000 / (n-2)) per middle touch
— the floor is part of the metric's definition, identical in both
engines, so every aggregate is an exact bigint sum (per-path rounding
loss < n nano-units stays in the path, never redistributed).

Scale: conversion extraction is one min-struct aggregate per user;
path ranking is a user-partitioned window (parallel over users, no
global order); the credit rollup is a map-side-combinable sum. The
touch->conversion join broadcasts nothing and shuffles on user_id once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_UNIT = 1_000_000_000
_END = 400_000_000   # first- and last-touch share
_MID = 200_000_000   # pooled middle share


def _oracle() -> str:
    return f"""
WITH conv AS (
  SELECT user_id, min(ts) AS p_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
touch AS (
  SELECT e.user_id, e.event_id, e.event_type, e.ts,
         row_number() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn,
         count(*) OVER (PARTITION BY e.user_id) AS n
  FROM events e JOIN conv c
    ON c.user_id = e.user_id AND e.ts < c.p_ts),
credit AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN {_UNIT}
              WHEN n = 2 THEN {_UNIT // 2}
              WHEN rn = 1 OR rn = n THEN {_END}
              ELSE {_MID} // (n - 2) END AS c,
         CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_first,
         CASE WHEN rn = n THEN 1 ELSE 0 END AS is_last
  FROM touch)
SELECT event_type,
       cast(count(*) AS bigint) AS n_touches,
       cast(sum(is_first) AS bigint) AS n_first,
       cast(sum(is_last) AS bigint) AS n_last,
       cast(sum(c) AS bigint) AS credit_nanos,
       round(sum(c) / {_UNIT}.0, 6) AS conversions_credited
FROM credit GROUP BY event_type ORDER BY event_type"""


@register(
    "multitouch_attribution",
    oracle=_oracle(),
    tags=("attribution", "funnel", "scale-pattern"),
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_touches, n_first, n_last, credit_nanos,
    conversions_credited): U-shaped attribution of each user's first
    purchase over the touches before it, exact integer nano-credits
    (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    conv = (e.filter(F.col("event_type") == "purchase")
            .groupBy("user_id").agg(F.min("ts").alias("p_ts")))
    touch = (e.join(conv, "user_id")
             .filter(F.col("ts") < F.col("p_ts"))
             .select("user_id", "event_id", "event_type", "ts"))
    wu = W.partitionBy("user_id")
    ranked = (touch
              .withColumn("rn", F.row_number().over(
                  wu.orderBy("ts", "event_id")))
              .withColumn("n", F.count(F.lit(1)).over(wu)))
    credit = (F.when(F.col("n") == 1, _UNIT)
              .when(F.col("n") == 2, _UNIT // 2)
              .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), _END)
              .otherwise(F.expr(f"{_MID} div (n - 2)")))
    c = ranked.select(
        "event_type", credit.alias("c"),
        F.when(F.col("rn") == 1, 1).otherwise(0).alias("is_first"),
        F.when(F.col("rn") == F.col("n"), 1).otherwise(0).alias("is_last"))
    return (c.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_touches"),
                 F.sum("is_first").cast("long").alias("n_first"),
                 F.sum("is_last").cast("long").alias("n_last"),
                 F.sum("c").cast("long").alias("credit_nanos"),
                 F.round(F.sum("c") / F.lit(float(_UNIT)), 6)
                 .alias("conversions_credited"))
            .orderBy("event_type"))
