"""Nelson-Aalen cumulative hazard — the additive twin of the Kaplan-Meier
product-limit curve (survival.py): H(t) = sum_{s <= t} d_s / n_s over the
same first-signup -> first-purchase durations with right censoring. NA is
what you plot to COMPARE hazards (differences of H are interpretable;
ratios of S are not) and its estimator is exactly computable: each
increment d/n is snapped to the nano lattice with INTEGER division, so
the cumulative sum rides exact bigints — no exp/ln needed at all, a
strictly stronger determinism story than KM's exp(cumsum(ln)) trick.

Scale stance identical to KM: one per-user reduction, then the whole
curve lives on the distinct-duration table (retention-window-bounded);
the cumulative window runs over that small table, never over users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000

_NA_ORACLE = f"""
WITH ends AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
signup AS (
  SELECT user_id, min(epoch_us(ts)) AS su
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
conv AS (
  SELECT s.user_id, s.su, min(epoch_us(e.ts)) AS pu
  FROM signup s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND epoch_us(e.ts) >= s.su
  GROUP BY s.user_id, s.su),
durs AS (
  SELECT CASE WHEN pu IS NOT NULL THEN (pu - su) // {_HOUR_US}
              ELSE ((SELECT end_us FROM ends) - su) // {_HOUR_US} END AS t,
         CASE WHEN pu IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM conv),
grid AS (
  SELECT t, sum(ev) AS d, sum(1 - ev) AS c FROM durs GROUP BY t),
curve AS (
  SELECT t, d, c,
         (SELECT count(*) FROM durs)
           - coalesce(sum(d + c) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM grid)
SELECT cast(t AS bigint) AS t_hours,
       cast(n_risk AS bigint) AS n_risk,
       cast(d AS bigint) AS n_events, cast(c AS bigint) AS n_censored,
       round(cast(sum((d * 1000000000) // n_risk)
                  OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS double) / 1e9, 6)
         AS cum_hazard
FROM curve
ORDER BY t_hours"""


@register(
    "nelson_aalen_hazard",
    oracle=_NA_ORACLE,
    tags=("survival", "timeseries"),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t_hours, n_risk, n_events, n_censored, cum_hazard): the
    Nelson-Aalen cumulative hazard of hours from first signup to first
    subsequent purchase, censored at study end, exact on the nano lattice
    (module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    end = ev.agg(F.max(F.unix_micros("ts")).alias("end_us"))
    signup = (ev.filter(F.col("event_type") == "signup")
              .groupBy("user_id")
              .agg(F.min(F.unix_micros("ts")).alias("su")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", F.unix_micros("ts").alias("p_us")))
    conv = (signup.join(pur, "user_id", "left")
            .filter(F.col("p_us").isNull() | (F.col("p_us") >= F.col("su")))
            .groupBy("user_id", "su").agg(F.min("p_us").alias("pu")))
    conv = signup.join(conv.select("user_id", "pu"), "user_id", "left")
    durs = (conv.crossJoin(F.broadcast(end))
            .select(
                F.when(F.col("pu").isNotNull(),
                       F.expr(f"(pu - su) div {_HOUR_US}"))
                 .otherwise(F.expr(f"(end_us - su) div {_HOUR_US}"))
                 .alias("t"),
                F.when(F.col("pu").isNotNull(), 1).otherwise(0).alias("ev")))
    grid = durs.groupBy("t").agg(F.sum("ev").alias("d"),
                                 F.sum(F.lit(1) - F.col("ev")).alias("c"))
    n_total = durs.agg(F.count(F.lit(1)).alias("n_all"))
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wrun = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    curve = (grid.crossJoin(F.broadcast(n_total))
             .withColumn(
                 "n_risk",
                 F.col("n_all") - F.coalesce(
                     F.sum(F.col("d") + F.col("c")).over(wcum), F.lit(0))))
    return (curve.select(
        F.col("t").cast("long").alias("t_hours"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.round(F.sum(F.expr("(d * 1000000000) div n_risk")).over(wrun)
                 .cast("double") / 1e9, 6).alias("cum_hazard"))
        .orderBy("t_hours"))
