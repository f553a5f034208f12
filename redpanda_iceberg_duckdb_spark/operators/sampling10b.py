"""Neyman-optimal stratified sample allocation — given a total probe
budget, allocate draws per stratum proportional to N_h * sd_h (the
allocation minimizing the stratified mean's variance; Neyman 1934).
Complements the existing stratified/hash samplers, which take PROPORTIONAL
allocations: under heteroscedastic strata the Neyman split is the one a
labeling-budget or QA-audit planner actually wants.

Exactness. Per-stratum variance comes from exact bigint sufficient stats
(n, sum cents, sum cents^2); sd_h is one IEEE-exact sqrt, then FLOORED to
an integer micro-unit weight w_h = n_h * floor(sd_h * 1e6) so the total
weight W, each stratum's quota (B*w_h) div W, and the largest-remainder
ranking ((B*w_h) mod W, exact bigints) are all integer arithmetic — the
apportionment cannot flip on a float ulp in either engine.

Scale: one map-side-combinable aggregate over the fact table; everything
after is k<=5 stratum rows (broadcast total + a tiny window)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_BUDGET = 1000
_SD_SCALE = 1_000_000


def _oracle() -> str:
    return f"""
WITH s AS (
  SELECT event_type, count(*) AS n_h,
         sum(cast(floor(value * 100) AS bigint)) AS s_h,
         sum(cast(floor(value * 100) AS bigint)
             * cast(floor(value * 100) AS bigint)) AS q_h
  FROM events GROUP BY 1),
w AS (
  SELECT event_type, n_h,
         sqrt((q_h - cast(s_h AS double) * s_h / n_h) / (n_h - 1)) AS sd,
         n_h * cast(floor(sqrt((q_h - cast(s_h AS double) * s_h / n_h)
                               / (n_h - 1)) * {_SD_SCALE}) AS bigint)
           AS w_scaled
  FROM s),
t AS (SELECT sum(w_scaled) AS tot FROM w),
quota AS (
  SELECT w.event_type, w.n_h, w.sd, w.w_scaled,
         ({_BUDGET} * w.w_scaled) // t.tot AS base,
         ({_BUDGET} * w.w_scaled) % t.tot AS rem
  FROM w, t),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, event_type) AS rk,
         (SELECT {_BUDGET} - sum(base) FROM quota) AS deficit
  FROM quota)
SELECT event_type, cast(n_h AS bigint) AS n_h, round(sd / 100, 6) AS sd,
       cast(w_scaled AS bigint) AS w_scaled,
       cast(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS bigint)
         AS alloc
FROM ranked ORDER BY event_type"""


@register(
    "neyman_allocation",
    oracle=_oracle(),
    tags=("sampling", "statistics"),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_h, sd, w_scaled, alloc): Neyman-optimal allocation
    of a {budget}-draw budget across event-type strata, exact-integer
    largest-remainder apportionment (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    s = (e.select("event_type", cents.alias("cents"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n_h"),
              F.sum("cents").alias("s_h"),
              F.sum(F.col("cents") * F.col("cents")).alias("q_h")))
    sd = F.sqrt((F.col("q_h") - F.col("s_h").cast("double") * F.col("s_h")
                 / F.col("n_h")) / (F.col("n_h") - 1))
    w = s.select("event_type", "n_h", sd.alias("sd"),
                 (F.col("n_h") * F.floor(sd * _SD_SCALE).cast("bigint"))
                 .alias("w_scaled"))
    t = w.agg(F.sum("w_scaled").alias("tot"))
    quota = (w.crossJoin(F.broadcast(t))
             .select("event_type", "n_h", "sd", "w_scaled",
                     F.expr(f"({_BUDGET} * w_scaled) div tot").alias("base"),
                     F.expr(f"({_BUDGET} * w_scaled) % tot").alias("rem")))
    deficit = quota.agg((F.lit(_BUDGET) - F.sum("base")).alias("deficit"))
    # k<=5 stratum rows: the unpartitioned rank window is a tiny reduction.
    ranked = (quota.crossJoin(F.broadcast(deficit))
              .withColumn("rk", F.row_number().over(
                  W.orderBy(F.desc("rem"), F.asc("event_type")))))
    return ranked.select(
        "event_type", F.col("n_h").cast("long").alias("n_h"),
        F.round(F.col("sd") / 100, 6).alias("sd"),
        F.col("w_scaled").cast("long").alias("w_scaled"),
        (F.col("base") + F.when(F.col("rk") <= F.col("deficit"), 1)
         .otherwise(0)).cast("long").alias("alloc")).orderBy("event_type")
