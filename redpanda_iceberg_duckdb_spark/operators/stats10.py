"""Trimmed and winsorized means per group — the robust location
estimates a metrics pipeline reports when tails are untrusted (trimmed:
drop the extreme 10% each side; winsorized: clamp them to the cut
values). Complements robust.py's MAD outlier screen with the
corresponding robust AGGREGATES.

Exactness: values ride as exact integer cents; trim boundaries are RANK
cuts (k = floor(n/10) rows off each side, a deterministic count, not a
percentile interpolation), so membership is integer arithmetic and both
engines sum identical exact sets. One per-group window for ranks + one
aggregate; groups parallelize, no global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_TRIM = 10  # percent per tail


def _oracle() -> str:
    return f"""
WITH v AS (
  SELECT event_type, event_id,
         cast(floor(value * 100) AS bigint) AS cents
  FROM events),
r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v),
marked AS (
  SELECT event_type, cents, n, n // {100 // _TRIM} AS k,
         rn > n // {100 // _TRIM} AND rn <= n - n // {100 // _TRIM} AS mid,
         CASE WHEN rn <= n // {100 // _TRIM}
              THEN 'lo' WHEN rn > n - n // {100 // _TRIM}
              THEN 'hi' ELSE 'mid' END AS zone
  FROM r),
cuts AS (
  SELECT event_type,
         min(CASE WHEN zone = 'mid' THEN cents END) AS lo_cut,
         max(CASE WHEN zone = 'mid' THEN cents END) AS hi_cut
  FROM marked GROUP BY event_type)
SELECT m.event_type,
       cast(max(m.n) AS bigint) AS n,
       cast(max(m.k) AS bigint) AS k_trimmed_per_side,
       round(sum(CASE WHEN m.zone = 'mid' THEN cast(m.cents AS double)
                      ELSE 0 END)
             / (max(m.n) - 2 * max(m.k)) / 100, 6) AS trimmed_mean,
       round(sum(CASE WHEN m.zone = 'lo' THEN cast(c.lo_cut AS double)
                      WHEN m.zone = 'hi' THEN cast(c.hi_cut AS double)
                      ELSE cast(m.cents AS double) END)
             / max(m.n) / 100, 6) AS winsorized_mean
FROM marked m JOIN cuts c ON c.event_type = m.event_type
GROUP BY m.event_type ORDER BY m.event_type"""


@register(
    "trimmed_winsorized_means",
    oracle=_oracle(),
    tags=("robust", "evaluation", "scale-pattern"),
)
def trimmed_winsorized_means(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """(event_type, n, k_trimmed_per_side, trimmed_mean, winsorized_mean):
    10%-per-tail trimmed and winsorized means of `value` per event type,
    rank-cut exact-cents arithmetic (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", "event_id",
                 F.floor(F.col("value") * 100).cast("bigint").alias("cents"))
    wp = W.partitionBy("event_type")
    r = (v.withColumn("rn", F.row_number().over(
            wp.orderBy("cents", "event_id")))
         .withColumn("n", F.count(F.lit(1)).over(wp)))
    k = F.expr(f"n div {100 // _TRIM}")
    marked = r.select(
        "event_type", "cents", "n", k.alias("k"),
        F.when(F.col("rn") <= k, "lo")
        .when(F.col("rn") > F.col("n") - k, "hi")
        .otherwise("mid").alias("zone"))
    cuts = (marked.groupBy("event_type")
            .agg(F.min(F.when(F.col("zone") == "mid", F.col("cents")))
                 .alias("lo_cut"),
                 F.max(F.when(F.col("zone") == "mid", F.col("cents")))
                 .alias("hi_cut")))
    m = marked.join(F.broadcast(cuts), "event_type")
    trimmed = (F.sum(F.when(F.col("zone") == "mid",
                            F.col("cents").cast("double")).otherwise(0.0))
               / (F.max("n") - 2 * F.max("k")) / 100)
    winsor = (F.sum(F.when(F.col("zone") == "lo",
                           F.col("lo_cut").cast("double"))
                    .when(F.col("zone") == "hi",
                          F.col("hi_cut").cast("double"))
                    .otherwise(F.col("cents").cast("double")))
              / F.max("n") / 100)
    return (m.groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n"),
                 F.max("k").cast("long").alias("k_trimmed_per_side"),
                 F.round(trimmed, 6).alias("trimmed_mean"),
                 F.round(winsor, 6).alias("winsorized_mean"))
            .orderBy("event_type"))
