"""Stratified ATT (average treatment effect on the treated) — the
observational-causal estimator between the experiment tier (CUPED,
diff-in-diff, Qini) and the survival/hazard family: no randomization,
so confounding is blocked by exact stratification on a PRE-treatment
covariate.

Design on the events table (all deterministic):
- treatment T: the user logged >= 1 'error' event during the corpus's
  FIRST DAY (global min ts + 24 h);
- outcome Y: the user's purchase count AFTER that first day;
- strata: the user's total first-day event count, capped at 3
  (least(3, d1) — pre-treatment activity, the classic confounder for
  "users who hit errors are just more active").

ATT = sum_s (nT_s / nT) * (mean(Y | T, s) - mean(Y | C, s)), reported
per stratum as an exact-count contribution column so the scalar ATT is
the verifiable column sum. Strata where either arm is empty contribute
NULL (and are excluded from nT weighting) — surfaced, not silently
dropped.

Exactness: every mean is a ratio of exact bigint sums; the one double
division per stratum rounds at 6.

Scale stance (100 TB): one user-keyed aggregate (map-side combinable)
then a <= 4-row stratum grid — the corpus never shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_DAY_US = 86_400_000_000

_ATT_ORACLE = f"""
WITH b AS (SELECT min(epoch_us(ts)) AS lo FROM events),
ue AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us(ts) < (SELECT lo FROM b) + {_DAY_US}
                  THEN 1 ELSE 0 END) AS d1,
         max(CASE WHEN event_type = 'error'
                  AND epoch_us(ts) < (SELECT lo FROM b) + {_DAY_US}
                  THEN 1 ELSE 0 END) AS t,
         sum(CASE WHEN event_type = 'purchase'
                  AND epoch_us(ts) >= (SELECT lo FROM b) + {_DAY_US}
                  THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id),
s AS (SELECT least(3, d1) AS stratum, t, cast(y AS bigint) AS y FROM ue),
g AS (SELECT stratum,
             cast(sum(t) AS bigint) AS n_t,
             cast(sum(1 - t) AS bigint) AS n_c,
             cast(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS bigint)
               AS sy_t,
             cast(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS bigint)
               AS sy_c
      FROM s GROUP BY stratum),
nt AS (SELECT cast(sum(n_t) AS bigint) AS total_t FROM g
       WHERE n_t > 0 AND n_c > 0)
SELECT cast(g.stratum AS int) AS stratum, n_t, n_c,
       round(CASE WHEN n_t > 0
                  THEN cast(sy_t AS double) / n_t END, 6) AS y_t_mean,
       round(CASE WHEN n_c > 0
                  THEN cast(sy_c AS double) / n_c END, 6) AS y_c_mean,
       round(CASE WHEN n_t > 0 AND n_c > 0
                  THEN (cast(n_t AS double) / (SELECT total_t FROM nt))
                       * (cast(sy_t AS double) / n_t
                          - cast(sy_c AS double) / n_c) END, 6)
         AS att_contrib
FROM g ORDER BY stratum"""


@register(
    "stratified_att_purchase",
    oracle=_ATT_ORACLE,
    tags=("causal", "observational", "stratification"),
)
def stratified_att_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stratum, n_t, n_c, y_t_mean, y_c_mean, att_contrib): per-stratum
    arms of the first-day-error -> later-purchases ATT design (module
    docstring); the scalar ATT is sum(att_contrib)."""
    e = load_table(spark, sf_dir, "events")
    lo = e.agg(F.min(F.unix_micros("ts")).alias("lo"))
    day1 = F.col("us") < F.col("lo") + _DAY_US
    ue = (e.select("user_id", "event_type",
                   F.unix_micros("ts").alias("us"))
          .crossJoin(F.broadcast(lo))
          .groupBy("user_id")
          .agg(F.sum(F.when(day1, 1).otherwise(0)).alias("d1"),
               F.max(F.when((F.col("event_type") == "error") & day1, 1)
                     .otherwise(0)).alias("t"),
               F.sum(F.when((F.col("event_type") == "purchase")
                            & ~day1, 1).otherwise(0)).cast("long")
               .alias("y")))
    s = ue.select(F.least(F.lit(3), F.col("d1")).alias("stratum"),
                  "t", "y")
    g = s.groupBy("stratum").agg(
        F.sum("t").cast("long").alias("n_t"),
        F.sum(1 - F.col("t")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long").alias("sy_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long").alias("sy_c"))
    nt = (g.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
          .agg(F.sum("n_t").cast("long").alias("total_t")))
    yt = F.when(F.col("n_t") > 0,
                F.col("sy_t").cast("double") / F.col("n_t"))
    yc = F.when(F.col("n_c") > 0,
                F.col("sy_c").cast("double") / F.col("n_c"))
    contrib = F.when(
        (F.col("n_t") > 0) & (F.col("n_c") > 0),
        (F.col("n_t").cast("double") / F.col("total_t"))
        * (F.col("sy_t").cast("double") / F.col("n_t")
           - F.col("sy_c").cast("double") / F.col("n_c")))
    return (g.crossJoin(F.broadcast(nt))
            .select(F.col("stratum").cast("int").alias("stratum"),
                    "n_t", "n_c",
                    F.round(yt, 6).alias("y_t_mean"),
                    F.round(yc, 6).alias("y_c_mean"),
                    F.round(contrib, 6).alias("att_contrib"))
            .orderBy("stratum"))
