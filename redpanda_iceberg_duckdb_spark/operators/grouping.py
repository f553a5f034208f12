"""Grouping-extension operators: CUBE, PIVOT, set operations, exact
percentiles, time-bucketed rollups (the batch twin of streaming windows).

Scale notes: cube/rollup expand grouping sets *before* the exchange — still a
single shuffle. Pivot with an explicit value list compiles to conditional
aggregates (one pass, no extra job to discover pivot values — always pass the
list at scale). Percentiles here are exact (sort-based within group); at
100 TB prefer approx_percentile unless the oracle requires exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import dsum, dsum_sql
from ..registry import register
from ..tables import load_table

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "cube_type_dow",
    oracle=f"""
SELECT event_type, dow, count(*) AS n, {dsum_sql("value", "total_value")}
FROM (SELECT event_type, cast(dayofweek(ts) AS int) AS dow, value FROM events)
GROUP BY CUBE (event_type, dow)
ORDER BY event_type NULLS FIRST, dow NULLS FIRST""",
    tags=("grouping",),
)
def cube_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all 4 grouping sets in one pass.

    dayofweek parity: DuckDB dayofweek = 0..6 Sunday-start; Spark dayofweek =
    1..7 Sunday-start, so subtract 1.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow"), "value")
    return (base.cube("event_type", "dow")
            .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
            .orderBy(F.asc_nulls_first("event_type"), F.asc_nulls_first("dow")))


@register(
    "pivot_user_bucket_by_type",
    oracle="""
SELECT user_id % 10 AS user_bucket,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events
GROUP BY user_bucket
ORDER BY user_bucket""",
    tags=("grouping",),
)
def pivot_user_bucket_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT event_type into columns. Explicit value list -> compiles to
    conditional counts, single aggregation pass (no value-discovery job)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select((F.col("user_id") % 10).alias("user_bucket"), "event_type")
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
        .orderBy("user_bucket")
    )


@register(
    "setop_engaged_users",
    oracle="""
SELECT 'purchase_no_error' AS cohort, count(*) AS n_users FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
UNION ALL
SELECT 'purchase_and_signup' AS cohort, count(*) AS n_users FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')""",
    tags=("grouping", "setop"),
)
def setop_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT cohort counts. Spark plans these as left-anti /
    left-semi joins over distinct inputs — same shuffle shape as the joins."""
    e = load_table(spark, sf_dir, "events")

    def users(t: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select("user_id").distinct()

    no_err = users("purchase").exceptAll(users("error")).distinct()
    both = users("purchase").intersect(users("signup"))
    a = no_err.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("purchase_no_error").alias("cohort"), "n_users")
    b = both.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("purchase_and_signup").alias("cohort"), "n_users")
    return a.unionAll(b)


@register(
    "percentiles_by_type",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type ORDER BY event_type""",
    tags=("grouping", "percentile"),
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` and
    DuckDB `quantile_cont` share the linear-interpolation definition).
    Quotient-valued, so round(…, 4) is midpoint-safe."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
                 F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"))
            .orderBy("event_type"))


@register(
    "events_hourly",
    oracle=f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, {dsum_sql("value", "total_value")},
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY hour, event_type
ORDER BY hour, event_type""",
    bench=True,
    tags=("grouping", "time"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window rollup — the batch equivalent of the streaming
    windowed aggregation in streaming/windowed.py (same grouping expression,
    so results are comparable across modes)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value", "total_value"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("hour", "event_type")
    )


@register(
    "rollup_chain_monthly",
    oracle=f"""
SELECT cast(date_trunc('month', ts) AS timestamp) AS month, event_type,
       count(*) AS n, {dsum_sql("value", "total_value")},
       cast(max(epoch_us(ts)) AS bigint) AS last_event_us
FROM events
GROUP BY month, event_type
ORDER BY month, event_type""",
    tags=("grouping", "time", "rollup"),
)
def rollup_chain_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly rollup computed as a CASCADE (events -> hourly -> daily ->
    monthly) rather than a direct group-by — the materialized-view chain a
    lakehouse actually maintains, where each tier re-aggregates the one
    below. Every aggregate carried through the chain is mergeable (count ->
    sum, decimal sum -> sum, max -> max), so the cascade is provably equal
    to the direct aggregation — which is exactly what the oracle computes.
    At 100 TB the hourly tier is the only scan of raw data; daily/monthly
    re-aggregate tables ~10^4x smaller."""
    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_v"),
                   F.max(F.unix_micros(F.col("ts"))).alias("last_us")))
    daily = (hourly.groupBy(F.date_trunc("day", "hour").alias("day"),
                            "event_type")
             .agg(F.sum("n").alias("n"), F.sum("dec_v").alias("dec_v"),
                  F.max("last_us").alias("last_us")))
    return (daily.groupBy(F.date_trunc("month", "day").alias("month"),
                          "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("dec_v").cast("double").alias("total_value"),
                 F.max("last_us").alias("last_event_us"))
            .select("month", "event_type", "n", "total_value",
                    "last_event_us")
            .orderBy("month", "event_type"))
