"""Round-15 rate-inference pair: Wilson score intervals and empirical-
Bayes (beta-binomial) rate shrinkage — the two readouts a metrics
pipeline actually ships for proportions, beside the resampling tier
(bootstrap CIs, jackknife SE): Wilson is the closed-form interval that
behaves at small n and extreme rates, and EB shrinkage is how per-user
rates get ranked without small-sample winners dominating.

Exactness: every input is an exact bigint count; both formulas are
fixed double expression trees (+-*/ and one IEEE sqrt each) written
identically in the two engines, rounded at 6. EB hyperparameters use
the method-of-moments fit on per-user rates snapped ONCE to the 1e9
lattice — the rate moments are then exact bigint/DECIMAL sums in any
order (a plain double sum of k/n ratios would be float-order
nondeterministic across engines).

Scale stance (100 TB): Wilson is one conditional aggregate per group;
EB is a user-keyed aggregate (map-side combinable) -> 1-row moment
frame -> broadcast join back for the shrunken top-10
(TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_Z = 1.959964  # 95% two-sided normal quantile, fixed literal

_WILSON_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         cast(count(*) AS bigint) AS n,
         cast(sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END)
              AS bigint) AS k
  FROM events GROUP BY event_type),
w AS (SELECT event_type, n, k,
             cast(k AS double) / n AS p,
             {_Z} * {_Z} AS z2
      FROM g)
SELECT event_type, n, k, round(p, 6) AS p_hat,
       round((p + z2 / (2 * n)
              - {_Z} * sqrt((p * (1 - p) + z2 / (4 * n)) / n))
             / (1 + z2 / n), 6) AS ci_lo,
       round((p + z2 / (2 * n)
              + {_Z} * sqrt((p * (1 - p) + z2 / (4 * n)) / n))
             / (1 + z2 / n), 6) AS ci_hi
FROM w ORDER BY event_type"""


@register(
    "wilson_ci_weekend_share",
    oracle=_WILSON_ORACLE,
    tags=("statistics", "interval", "proportion"),
)
def wilson_ci_weekend_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, k, p_hat, ci_lo, ci_hi): Wilson 95% score
    interval for the weekend share of each event type — identical
    closed-form double tree in both engines over exact counts."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.weekday("ts") >= 5, 1).otherwise(0))
        .cast("long").alias("k"))
    p = F.col("k").cast("double") / F.col("n")
    z2 = F.lit(_Z * _Z)
    center = p + z2 / (2 * F.col("n"))
    half = F.lit(_Z) * F.sqrt((p * (1 - p) + z2 / (4 * F.col("n")))
                              / F.col("n"))
    denom = 1 + z2 / F.col("n")
    return (g.select("event_type", "n", "k",
                     F.round(p, 6).alias("p_hat"),
                     F.round((center - half) / denom, 6).alias("ci_lo"),
                     F.round((center + half) / denom, 6).alias("ci_hi"))
            .orderBy("event_type"))


_EB_ORACLE = """
WITH u AS (
  SELECT user_id, cast(count(*) AS bigint) AS n,
         cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS bigint) AS k
  FROM events GROUP BY user_id),
r9 AS (SELECT user_id, n, k,
              cast(round(1000000000 * (cast(k AS double) / n))
                   AS bigint) AS ri
       FROM u),
m AS (SELECT cast(count(*) AS bigint) AS nu,
             cast(sum(ri) AS bigint) AS sr9,
             cast(sum(cast(ri AS decimal(19, 0)) * ri)
                  AS decimal(38, 0)) AS srr18
      FROM r9),
h AS (SELECT nu,
             cast(sr9 AS double) / nu / 1e9 AS mu,
             (cast(srr18 AS double)
              - cast(sr9 AS double) * sr9 / nu) / (nu - 1) / 1e18 AS vr
      FROM m),
ab AS (SELECT mu, vr,
             CASE WHEN vr > 0 AND mu * (1 - mu) > vr
                  THEN mu * (mu * (1 - mu) / vr - 1) ELSE 1.0 END
               AS alpha,
             CASE WHEN vr > 0 AND mu * (1 - mu) > vr
                  THEN (1 - mu) * (mu * (1 - mu) / vr - 1) ELSE 1.0 END
               AS beta
      FROM h)
SELECT u.user_id, u.n, u.k,
       round(cast(u.k AS double) / u.n, 6) AS raw_rate,
       round((u.k + ab.alpha) / (u.n + ab.alpha + ab.beta), 6)
         AS eb_rate
FROM u CROSS JOIN ab
ORDER BY eb_rate DESC, user_id LIMIT 10"""


@register(
    "eb_shrunken_user_rates",
    oracle=_EB_ORACLE,
    tags=("statistics", "empirical-bayes", "ranking"),
)
def eb_shrunken_user_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n, k, raw_rate, eb_rate): top-10 users by beta-binomial
    empirical-Bayes shrunken purchase rate — method-of-moments
    (alpha, beta) from the per-user rate mean/variance, posterior-mean
    shrinkage (k + a)/(n + a + b), deterministic (rate, user) order."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("k"))
    r = F.col("k").cast("double") / F.col("n")
    r9 = u.select("user_id", "n", "k",
                  F.round(F.lit(1_000_000_000) * r).cast("long")
                  .alias("ri"))
    m = r9.agg(F.count(F.lit(1)).cast("long").alias("nu"),
               F.sum("ri").cast("long").alias("sr9"),
               F.sum(F.col("ri").cast("decimal(19,0)") * F.col("ri"))
               .cast("decimal(38,0)").alias("srr18"))
    h = m.select(
        "nu",
        (F.col("sr9").cast("double") / F.col("nu") / 1e9).alias("mu"),
        ((F.col("srr18").cast("double")
          - F.col("sr9").cast("double") * F.col("sr9") / F.col("nu"))
         / (F.col("nu") - 1) / 1e18).alias("vr"))
    fit_ok = (F.col("vr") > 0) & (F.col("mu") * (1 - F.col("mu"))
                                  > F.col("vr"))
    scale = F.col("mu") * (1 - F.col("mu")) / F.col("vr") - 1
    ab = h.select(
        F.when(fit_ok, F.col("mu") * scale).otherwise(F.lit(1.0))
        .alias("alpha"),
        F.when(fit_ok, (1 - F.col("mu")) * scale).otherwise(F.lit(1.0))
        .alias("beta"))
    return (u.crossJoin(F.broadcast(ab))
            .select("user_id", "n", "k",
                    F.round(r, 6).alias("raw_rate"),
                    F.round((F.col("k") + F.col("alpha"))
                            / (F.col("n") + F.col("alpha")
                               + F.col("beta")), 6).alias("eb_rate"))
            .orderBy(F.col("eb_rate").desc(), "user_id").limit(10))