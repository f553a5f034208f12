"""Product-analytics operators over the event stream: statistical outlier
detection, conversion funnels, and retention cohorts — the query shapes BI
layers generate, expressed once and verified against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# Deterministic moments: exact decimal sums of x and x^2, variance assembled
# arithmetically. Built-in stddev/var_pop accumulate in floating point
# (Welford / chunked) whose order differs per engine — never oracle-safe.
_MOMENTS_DUCK = """
moments AS (
  SELECT event_type,
         count(value) AS n,
         cast(sum(cast(value AS decimal(18,2))) AS double) AS s1,
         cast(sum(cast(value AS decimal(18,2)) * cast(value AS decimal(18,2)))
              AS double) AS s2
  FROM events GROUP BY event_type)
"""


def _moments(e: DataFrame) -> DataFrame:
    v = F.col("value").cast("decimal(18,2)")
    return e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )


@register(
    "zscore_outliers",
    oracle=f"""
WITH {_MOMENTS_DUCK}
SELECT e.event_type, e.event_id, e.value,
       round((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) AS z
FROM events e JOIN moments m ON e.event_type = m.event_type
WHERE abs((e.value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 3
ORDER BY e.event_type, e.event_id""",
    tags=("analytics", "stats"),
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3). Population variance assembled
    from exact decimal sums (s2/n - mean^2) so mean, std, and every z-score
    are bit-identical across engines; broadcast the 5-row moments table."""
    e = load_table(spark, sf_dir, "events")
    m = _moments(e)
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (F.col("value") - mean) / std
    return (e.join(F.broadcast(m), "event_type")
            .filter(F.abs(z) > 3)
            .select("event_type", "event_id", "value",
                    F.round(z, 4).alias("z"))
            .orderBy("event_type", "event_id"))


@register(
    "conversion_funnel",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS did_signup,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
  FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       cast(sum(did_signup) AS bigint) AS signed_up,
       cast(sum(CASE WHEN did_signup = 1 AND did_view = 1
                     THEN 1 ELSE 0 END) AS bigint) AS viewed,
       cast(sum(CASE WHEN did_signup = 1 AND did_view = 1 AND did_purchase = 1
                     THEN 1 ELSE 0 END) AS bigint) AS purchased
FROM per_user""",
    tags=("analytics", "funnel"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup -> view -> purchase funnel: per-user step flags in one
    aggregation pass (conditional max), then one global combine — the
    two-level aggregate every funnel query should compile to (never a
    per-step self-join)."""
    e = load_table(spark, sf_dir, "events")

    def did(t: str, alias: str):
        return F.max(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(alias)

    per_user = e.groupBy("user_id").agg(
        did("signup", "did_signup"), did("view", "did_view"),
        did("purchase", "did_purchase"))
    s, v, p = (F.col("did_signup"), F.col("did_view"), F.col("did_purchase"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s).alias("signed_up"),
        F.sum(F.when((s == 1) & (v == 1), 1).otherwise(0)).alias("viewed"),
        F.sum(F.when((s == 1) & (v == 1) & (p == 1), 1).otherwise(0))
        .alias("purchased"),
    )


@register(
    "retention_cohorts",
    oracle="""
WITH firsts AS (SELECT user_id, min(cast(ts AS date)) AS cohort_day
                FROM events GROUP BY user_id),
activity AS (SELECT DISTINCT e.user_id, f.cohort_day,
                    date_diff('day', f.cohort_day, cast(e.ts AS date)) AS day_n
             FROM events e JOIN firsts f ON e.user_id = f.user_id)
SELECT cohort_day, cast(day_n AS int) AS day_n,
       count(*) AS active_users
FROM activity
WHERE day_n <= 7
GROUP BY cohort_day, day_n
ORDER BY cohort_day, day_n""",
    tags=("analytics", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-seen day, activity counted
    per day-offset for the first week. The firsts table is user-cardinality —
    broadcast; day arithmetic is exact integer date math."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day"))
    activity = (
        e.join(F.broadcast(firsts), "user_id")
        .select("user_id", "cohort_day",
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
                .alias("day_n"))
        .distinct()
    )
    return (activity.filter(F.col("day_n") <= 7)
            .groupBy("cohort_day", F.col("day_n").cast("int").alias("day_n"))
            .agg(F.count(F.lit(1)).alias("active_users"))
            .orderBy("cohort_day", "day_n"))
