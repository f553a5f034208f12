"""Product-analytics operators over the event stream: statistical outlier
detection, conversion funnels, and retention cohorts — the query shapes BI
layers generate, expressed once and verified against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

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


@register(
    "ordered_funnel_users",
    oracle="""
WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
v AS (SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t0
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t1
      GROUP BY e.user_id)
SELECT (SELECT count(*) FROM s) AS n_signup,
       (SELECT count(*) FROM v) AS n_then_view,
       (SELECT count(*) FROM p) AS n_then_purchase""",
    tags=("analytics", "funnel"),
)
def ordered_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly ORDERED funnel (signup -> later view -> later purchase):
    each stage requires an event strictly after the user's previous stage
    time, unlike presence-based funnels that overcount users who purchased
    before signing up. Each stage is one semi-join+min over per-user
    aggregates — the event table is scanned once per stage with the stage
    filter pushed down, and every intermediate table is one row per user."""
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t0")))
    v = (e.filter(F.col("event_type") == "view")
         .join(s, "user_id").filter(F.col("ts") > F.col("t0"))
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(v, "user_id").filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    return (s.agg(F.count(F.lit(1)).alias("n_signup"))
            .join(F.broadcast(v.agg(F.count(F.lit(1)).alias("n_then_view"))))
            .join(F.broadcast(
                p.agg(F.count(F.lit(1)).alias("n_then_purchase")))))


@register(
    "rfm_segments",
    oracle="""
WITH rfm AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS recency,
         count(*) AS frequency,
         sum(cast(o_totalprice AS decimal(18,2))) AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT custkey,
         ntile(4) OVER (ORDER BY recency, custkey) AS r,
         ntile(4) OVER (ORDER BY frequency, custkey) AS f,
         ntile(4) OVER (ORDER BY monetary, custkey) AS m
  FROM rfm)
SELECT r, f, m, count(*) AS n_customers
FROM scored GROUP BY r, f, m ORDER BY r, f, m""",
    tags=("analytics", "segmentation"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score each customer on Recency (last
    order), Frequency (order count), Monetary (exact decimal spend), then
    count the population of each of the 64 segments. The three NTILEs run
    over the per-customer rollup (one row per customer, not per order) with
    custkey tiebreaks for engine-independent bucket edges. An unpartitioned
    NTILE is a single-sort bottleneck at extreme cardinality — at 100 TB,
    score within a hash-bucketed stratum or swap NTILE for percent_rank
    over pre-aggregated distributions; the rollup-first structure is what
    keeps either variant cheap."""
    o = load_table(spark, sf_dir, "orders")
    rfm = (o.groupBy(F.col("o_custkey").alias("custkey"))
           .agg(F.max("o_orderdate").alias("recency"),
                F.count(F.lit(1)).alias("frequency"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .alias("monetary")))
    scored = rfm.select(
        "custkey",
        F.ntile(4).over(W.orderBy("recency", "custkey")).alias("r"),
        F.ntile(4).over(W.orderBy("frequency", "custkey")).alias("f"),
        F.ntile(4).over(W.orderBy("monetary", "custkey")).alias("m"))
    return (scored.groupBy("r", "f", "m")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("r", "f", "m"))
