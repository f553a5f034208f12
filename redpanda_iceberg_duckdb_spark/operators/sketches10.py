"""AMS second-moment (F2) sketch — the self-join-size estimator that
completes the mergeable-sketch family (FM distinct count in sketches.py,
sliding-window HLL in sketches9.py, KMV overlap, count-min heavy hitters):
Alon, Matias & Szegedy, STOC 1996 ("The space complexity of approximating
the frequency moments"), tug-of-war variant.

F2 = sum_u c_u^2 is the size of the self-join on the key — the quantity a
planner wants BEFORE running a join. The sketch keeps 16 counters
S_j = sum_u sign_j(u) * c_u where sign_j(u) = +/-1 from the cross-engine
md5 hash (functions/hashing.py), so each S_j^2 is an unbiased F2 estimate.
EVERYTHING here is exact 64-bit integer arithmetic in both engines: counts
are bigints, signs are +/-1, each estimator's square <= (sum c_u)^2 which
int64 holds for any realistic stream slice, and the mean over 16 estimators
is the only division (rounded at 2).

Sketch algebra, same as the FM/HLL registers: S_j of a union of shards is
the SUM of per-shard S_j — a 16-number mergeable state, so at 100 TB each
partition folds its slice into 16 bigints map-side and the shuffle carries
one row per sketch index. The estimate's quality is itself the output:
rel_error against the exactly-computed F2 (one groupBy away on the fixture)
is the measurable accuracy claim, and the planted test checks the estimator
concentrates (mean within ~1/sqrt(16) relative of truth on a skewed
stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from ..functions.hashing import md5_mod_duck, md5_mod_spark

_J = 16          # tug-of-war estimators

_SIGN = "concat('f2:', cast(j as string), ':', cast(user_id as string))"
_SIGN_D = "'f2:' || cast(j as varchar) || ':' || cast(user_id as varchar)"


def _oracle() -> str:
    return f"""
WITH c AS (
  SELECT user_id, cast(count(*) AS bigint) AS cu
  FROM events GROUP BY 1),
exact AS (
  SELECT cast(count(*) AS bigint) AS n_users,
         cast(sum(cu * cu) AS bigint) AS f2 FROM c),
jx AS (SELECT unnest(range({_J})) AS j),
s AS (
  SELECT jx.j,
         sum((1 - 2 * {md5_mod_duck(_SIGN_D, 2)}) * c.cu) AS sj
  FROM c CROSS JOIN jx GROUP BY 1),
est AS (
  SELECT cast(sum(sj * sj) AS bigint) AS sum_est,
         cast(min(sj * sj) AS bigint) AS min_est,
         cast(max(sj * sj) AS bigint) AS max_est
  FROM s)
SELECT e.n_users, e.f2,
       round(est.sum_est * 1.0 / {_J}, 2) AS f2_est,
       est.min_est, est.max_est,
       round(abs(est.sum_est * 1.0 / {_J} - e.f2) / e.f2, 6) AS rel_error
FROM exact e, est"""


@register(
    "ams_f2_sketch",
    oracle=_oracle(),
    tags=("sketch", "statistics", "scale-pattern"),
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_users, f2, f2_est, min_est, max_est, rel_error): exact self-join
    size F2 of the events user_id stream beside its 16-estimator AMS
    tug-of-war sketch — exact integer counters, md5 signs, one combinable
    aggregate per side."""
    e = load_table(spark, sf_dir, "events")
    c = (e.groupBy("user_id")
         .agg(F.count(F.lit(1)).cast("long").alias("cu")))
    exact = c.agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                  F.sum(F.col("cu") * F.col("cu")).cast("long").alias("f2"))
    jx = spark.range(_J).select(F.col("id").alias("j"))
    s = (c.crossJoin(F.broadcast(jx))
         .select("j", ((1 - 2 * F.expr(md5_mod_spark(_SIGN, 2)))
                       * F.col("cu")).alias("term"))
         .groupBy("j").agg(F.sum("term").alias("sj")))
    est = s.agg(F.sum(F.col("sj") * F.col("sj")).cast("long")
                .alias("sum_est"),
                F.min(F.col("sj") * F.col("sj")).cast("long")
                .alias("min_est"),
                F.max(F.col("sj") * F.col("sj")).cast("long")
                .alias("max_est"))
    return (exact.crossJoin(F.broadcast(est))
            .select("n_users", "f2",
                    F.round(F.col("sum_est") * 1.0 / _J, 2).alias("f2_est"),
                    "min_est", "max_est",
                    F.round(F.abs(F.col("sum_est") * 1.0 / _J - F.col("f2"))
                            / F.col("f2"), 6).alias("rel_error")))
