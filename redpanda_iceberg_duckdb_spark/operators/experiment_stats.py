"""CUPED variance-reduced experiment readout (Deng, Xu, Kohavi & Walker,
WSDM 2013) — the standard large-scale A/B analysis: adjust each unit's
post-period metric by its pre-period baseline to shrink variance without
biasing the treatment-effect estimate.

    theta    = cov(pre, post) / var(pre)          (pooled, both arms)
    adjusted = post - theta * (pre - mean(pre))

Scale stance: the whole readout is sufficient statistics. Pass 1 is one
hash aggregate (events -> per-user pre/post sums, map-side combinable);
pass 2 is one global aggregate producing THREE scalars (theta, the pooled
pre-mean, and n) broadcast back via a literal-sized cross join; pass 3 is
the per-arm aggregate over #arms rows of output. No window, no sort, no
per-user state beyond the pass-1 groupBy — at 100 TB this is exactly two
shuffles of user-level partial sums. Arm assignment is a deterministic
seeded hash of user_id (functions/hashing.py md5 helpers), the same
coordination-free bucketing every experimentation platform uses, so both
engines derive identical arms with no stored assignment table.

Float note: variances/covariances are order-of-summation sensitive at the
1e-15 relative level; all surfaced aggregates round to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

# Pre/post boundary: midpoint of the fixture's January 2024 event window.
_SPLIT = "2024-01-16 00:00:00"


def _oracle() -> str:
    arm = md5_mod_duck("'arm:' || cast(user_id AS varchar)", 2)
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN {arm} = 0 THEN 'control' ELSE 'treatment' END AS arm,
         coalesce(sum(CASE WHEN ts <  TIMESTAMP '{_SPLIT}' THEN value END), 0.0) AS pre,
         coalesce(sum(CASE WHEN ts >= TIMESTAMP '{_SPLIT}' THEN value END), 0.0) AS post
  FROM events GROUP BY user_id),
pooled AS (
  SELECT covar_pop(pre, post) / var_pop(pre) AS theta,
         avg(pre) AS pre_mean
  FROM per_user)
SELECT arm,
       cast(count(*) AS bigint) AS n_users,
       round(avg(post), 4) AS mean_post,
       round(avg(post - p.theta * (pre - p.pre_mean)), 4) AS mean_adjusted,
       round(var_pop(post), 4) AS var_post,
       round(var_pop(post - p.theta * (pre - p.pre_mean)), 4) AS var_adjusted,
       round(any_value(p.theta), 4) AS theta
FROM per_user, pooled p
GROUP BY arm
ORDER BY arm"""


@register(
    "cuped_adjusted_metrics",
    oracle=_oracle(),
    tags=("experiment", "variance-reduction", "scale-pattern"),
)
def cuped_adjusted_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm CUPED readout over ``events``: users hash-split into
    control/treatment, ``value`` summed per user into pre/post periods,
    theta fitted pooled, and both raw and adjusted post-period means and
    variances reported. var_adjusted < var_post is the whole point of the
    estimator; the oracle recomputes every step, so a green row proves the
    hash arms, the conditional sums, and the pooled theta all agree."""
    arm = F.when(
        F.expr(md5_mod_spark("concat('arm:', cast(user_id as string))", 2))
        == 0, F.lit("control")).otherwise(F.lit("treatment"))
    split = F.lit(_SPLIT).cast("timestamp")
    per_user = (load_table(spark, sf_dir, "events")
                .groupBy("user_id")
                .agg(F.coalesce(
                         F.sum(F.when(F.col("ts") < split, F.col("value"))),
                         F.lit(0.0)).alias("pre"),
                     F.coalesce(
                         F.sum(F.when(F.col("ts") >= split, F.col("value"))),
                         F.lit(0.0)).alias("post"))
                .withColumn("arm", arm))
    pooled = per_user.agg(
        (F.covar_pop("pre", "post") / F.var_pop("pre")).alias("theta"),
        F.avg("pre").alias("pre_mean"))
    adj = (F.col("post")
           - F.col("theta") * (F.col("pre") - F.col("pre_mean")))
    return (per_user.crossJoin(F.broadcast(pooled))
            .groupBy("arm")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.round(F.avg("post"), 4).alias("mean_post"),
                 F.round(F.avg(adj), 4).alias("mean_adjusted"),
                 F.round(F.var_pop("post"), 4).alias("var_post"),
                 F.round(F.var_pop(adj), 4).alias("var_adjusted"),
                 F.round(F.any_value(F.col("theta")), 4).alias("theta"))
            .orderBy("arm"))
