"""Delete-one-bucket jackknife standard error for a RATIO metric — the
way experimentation platforms attach uncertainty to ratio KPIs
(revenue per event, CTR) where user-level correlation breaks the iid
variance formula (Tukey 1958; the bucket variant every large A/B system
runs).

Metric: purchase revenue per event, theta = S / N with S = exact-cents
purchase revenue and N = event count. Users hash into B = 50 buckets;
theta_(b) = (S - s_b) / (N - n_b) deletes bucket b by sufficient-stats
recombination (the ablation.py device — one scan, all B leave-one-out
estimates).

Float discipline: per-bucket (s_b, n_b) are exact integers from ONE
aggregate; the jackknife mean and sum-of-squares are then evaluated as a
FIXED-ORDER (bucket-ascending) fold — the driver loops ascending b, the
oracle folds a bucket-ordered list — so both engines run the identical
float program and agree bit-for-bit (not just to rounding). B is
constant, so collecting B rows to the driver is item-cardinality, like
the BT wins matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_B = 50


def _oracle() -> str:
    return f"""
WITH bk AS (
  SELECT user_id % {_B} AS b,
         sum(CASE WHEN event_type = 'purchase'
                  THEN cast(floor(value * 100) AS bigint) ELSE 0 END) AS s,
         count(*) AS n
  FROM events GROUP BY 1),
tot AS (SELECT sum(s) AS ss, sum(n) AS nn, count(*) AS nb FROM bk),
loo AS (SELECT list(cast(tot.ss - bk.s AS double) / (tot.nn - bk.n)
                    ORDER BY bk.b) AS th,
               max(tot.ss) AS ss, max(tot.nn) AS nn, max(tot.nb) AS nb
        FROM bk, tot),
stats AS (
  SELECT ss, nn, nb, th,
         list_sum(th) / nb AS mu
  FROM loo)
SELECT cast(nb AS bigint) AS n_buckets,
       round(cast(ss AS double) / nn, 6) AS theta_full,
       round(mu, 6) AS theta_jack_mean,
       round(sqrt((nb - 1.0) / nb
                  * list_sum([(x - mu) * (x - mu) FOR x IN th])), 6)
         AS jack_se
FROM stats"""


@register(
    "jackknife_ratio_se",
    oracle=_oracle(),
    tags=("evaluation", "experiment", "scale-pattern"),
)
def jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_buckets, theta_full, theta_jack_mean, jack_se): delete-one-
    bucket jackknife for revenue-per-event (module docstring). One
    integer-exact bucket aggregate; the B-term float fold runs in the
    same bucket-ascending order on both engines."""
    e = load_table(spark, sf_dir, "events")
    bk = (e.groupBy(F.pmod("user_id", _B).alias("b"))
          .agg(F.sum(F.when(F.col("event_type") == "purchase",
                            F.floor(F.col("value") * 100).cast("bigint"))
                     .otherwise(0)).alias("s"),
               F.count(F.lit(1)).alias("n"))
          .collect())  # B rows — bucket-cardinality
    bk = sorted(bk, key=lambda r: r["b"])
    ss = sum(r["s"] for r in bk)
    nn = sum(r["n"] for r in bk)
    nb = len(bk)
    th = [float(ss - r["s"]) / (nn - r["n"]) for r in bk]
    mu = sum(th) / nb   # left-to-right ascending b, like list_sum
    sq = sum((x - mu) * (x - mu) for x in th)
    se = ((nb - 1.0) / nb * sq) ** 0.5
    out = [(nb, round(float(ss) / nn, 6), round(mu, 6), round(se, 6))]
    return spark.createDataFrame(
        out, "n_buckets bigint, theta_full double, "
             "theta_jack_mean double, jack_se double")
