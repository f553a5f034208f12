"""Kaplan-Meier survival estimation (Kaplan & Meier, JASA 1958) — the
product-limit curve for time-from-signup-to-first-purchase with right
censoring, the estimator behind every conversion-latency / retention
curve where some users simply haven't converted yet (dropping them
biases the naive quantiles; KM handles them correctly as censored).

Per distinct integer hour t (d_t conversions, c_t censorings,
n_t = at-risk count):

    S(t) = prod_{s <= t} (1 - d_s / n_s)

Scale stance: events collapse to one row per user (first signup, first
subsequent purchase) in one hash aggregate; the curve then lives on the
DISTINCT-duration table (retention-window-bounded, like the exact-stats
value-histogram decomposition — sort D distinct hours, not N users).
n_t comes from one cumulative window over that small table; the running
product is computed as exp(cumsum(ln ...)) with the IDENTICAL expression
in both engines (transcendentals can differ in the last ulp across
libms, which rounding to 6 dp absorbs — ranks never depend on them).
The only broadcast is the single study-end timestamp used for censoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000


def _oracle() -> str:
    return f"""
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
       CASE WHEN min(1.0 - cast(d AS double) / n_risk)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) = 0.0 THEN 0.0
            ELSE round(exp(sum(ln(nullif(1.0 - cast(d AS double) / n_risk,
                                         0.0)))
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)), 6) END AS survival
FROM curve
ORDER BY t_hours"""


@register(
    "kaplan_meier_conversion",
    oracle=_oracle(),
    tags=("survival", "timeseries", "scale-pattern"),
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t_hours, n_risk, n_events, n_censored, survival): the KM curve of
    hours from first signup to first subsequent purchase, users without a
    purchase censored at study end. A green row proves the per-user
    reduction, the risk-set accounting, and the product-limit recursion
    agree with the oracle's independent SQL construction."""
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
    # Users whose every purchase precedes signup look converted-free after
    # the filter only if a NULL row survives — re-left-join to keep them.
    conv = (signup.join(conv.select("user_id", "pu"), "user_id", "left"))
    durs = (conv.crossJoin(F.broadcast(end))
            .select(
                F.when(F.col("pu").isNotNull(),
                       F.expr(f"(pu - su) div {_HOUR_US}"))
                .otherwise(F.expr(f"(end_us - su) div {_HOUR_US}"))
                .alias("t"),
                F.when(F.col("pu").isNotNull(), 1).otherwise(0).alias("ev")))
    n_total = durs.agg(F.count(F.lit(1)).alias("n_all"))
    grid = (durs.groupBy("t")
            .agg(F.sum("ev").alias("d"),
                 F.sum(F.lit(1) - F.col("ev")).alias("c")))
    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("t").rowsBetween(W.unboundedPreceding, W.currentRow)
    curve = (grid.crossJoin(F.broadcast(n_total))
             .withColumn("n_risk", F.col("n_all") - F.coalesce(
                 F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))))
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
    # A fully-converting row makes the factor 0 and the curve 0 from then
    # on; ln(0) is an error in DuckDB (and NULL in Spark), so both engines
    # skip zero factors in the log-sum and zero the tail via the running
    # minimum instead — the identical expression on both sides.
    return (curve
            .withColumn("survival", F.when(
                F.min(factor).over(w_cum) == 0.0, F.lit(0.0)
            ).otherwise(F.round(F.exp(F.sum(
                F.log(F.nullif(factor, F.lit(0.0)))).over(w_cum)), 6)))
            .select(F.col("t").cast("long").alias("t_hours"),
                    F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("d").cast("long").alias("n_events"),
                    F.col("c").cast("long").alias("n_censored"),
                    "survival")
            .orderBy("t_hours"))
