"""Time-series regularization over ``events``: dense hourly resampling with
zero-fill, forward-fill, and linear interpolation, plus trailing moving
statistics over the regular grid.

These are the operators that turn an irregular event stream into the regular
series a forecasting/feature pipeline consumes. The irregular->regular step
is where naive implementations go quadratic or driver-side; here the grid is
generated from ONE global min/max row (`sequence` + explode), the event data
is reduced to (type, hour) aggregates BEFORE any window runs, and every
window partition is |hours per type| — bounded by calendar time, not by data
volume, so the same plan holds at 100 TB.

Determinism: grid positions are integer row indexes over the dense grid
(consecutive hours), so fill/interpolation distances are exact integers;
interpolated values are IEEE ops over identically-rounded doubles in both
engines.

Reference parity: the reference has no time-series surface (closest is the
minute-bucket GROUP BY in /root/reference/duckdb/query_and_publish.py:115);
additive coverage per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table


def _hourly_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (event_type, hour) grid from the global [min, max] hour span:
    one single-row global aggregate, sequence-exploded, cross-joined with
    the distinct type dimension (both broadcast-sized)."""
    e = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    bounds = e.agg(F.min(hr).alias("h0"), F.max(hr).alias("h1"))
    hours = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"))
    types = e.select("event_type").distinct()
    return hours.crossJoin(types)


_GRID_CTE_DUCK = """
b AS (SELECT date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1 FROM events),
g AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
ty AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS n, round(avg(value), 6) AS v
      FROM events GROUP BY 1, 2),
grid AS (
  SELECT ty.event_type, g.hour,
         coalesce(c.n, 0) AS n_events, c.v,
         row_number() OVER (PARTITION BY ty.event_type
                            ORDER BY g.hour) AS rn
  FROM g CROSS JOIN ty
  LEFT JOIN c ON c.event_type = ty.event_type AND c.hour = g.hour)
"""


def _filled_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid left-joined with per-(type, hour) aggregates: zero-filled counts,
    nullable rounded hourly mean, and an integer grid position `rn`."""
    e = load_table(spark, sf_dir, "events")
    agg = (e.groupBy("event_type",
                     F.date_trunc("hour", F.col("ts")).alias("hour"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.avg("value"), 6).alias("v")))
    grid = _hourly_grid(spark, sf_dir)
    return (grid.join(agg, ["event_type", "hour"], "left")
            .select("event_type", "hour",
                    F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
                    "v",
                    F.row_number().over(
                        W.partitionBy("event_type").orderBy("hour"))
                    .alias("rn")))


@register(
    "gap_fill_hourly",
    bench=True,
    oracle=f"""
WITH {_GRID_CTE_DUCK},
f AS (
  SELECT event_type, hour, n_events, v, rn,
         last_value(v IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
             OVER w_prev AS prn,
         first_value(v IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
             OVER w_next AS nrn
  FROM grid
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w_next AS (PARTITION BY event_type ORDER BY rn
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
SELECT event_type, hour, n_events,
       coalesce(v, pv) AS carried_avg,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              round(pv + (nv - pv) * (rn - prn) * 1.0 / (nrn - prn), 6)
            END AS interp_avg
FROM f ORDER BY event_type, hour""",
    tags=("timeseries", "gapfill", "window"),
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the event stream to a dense hourly series per type:
    missing hours get n_events = 0, `carried_avg` forward-fills the last
    observed hourly mean, and `interp_avg` linearly interpolates between
    the nearest observed hours (null before the first / after the last
    observation). Fill distances use the integer grid index, so the
    interpolation fraction is an exact small-int ratio. The event table is
    reduced to (type, hour) BEFORE the windows run — the fill windows scan
    |hours| rows per type, never raw events."""
    g = _filled_grid(spark, sf_dir)
    w_prev = (W.partitionBy("event_type").orderBy("rn")
              .rowsBetween(W.unboundedPreceding, -1))
    w_next = (W.partitionBy("event_type").orderBy("rn")
              .rowsBetween(1, W.unboundedFollowing))
    vrn = F.when(F.col("v").isNotNull(), F.col("rn"))
    f = (g.withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
         .withColumn("prn", F.last(vrn, ignorenulls=True).over(w_prev))
         .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
         .withColumn("nrn", F.first(vrn, ignorenulls=True).over(w_next)))
    interp = (F.when(F.col("v").isNotNull(), F.col("v"))
              .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(),
                    F.round(F.col("pv")
                            + (F.col("nv") - F.col("pv"))
                            * (F.col("rn") - F.col("prn"))
                            / (F.col("nrn") - F.col("prn")), 6)))
    return (f.select("event_type", "hour", "n_events",
                     F.coalesce("v", "pv").alias("carried_avg"),
                     interp.alias("interp_avg"))
            .orderBy("event_type", "hour"))


@register(
    "hourly_moving_stats",
    oracle=f"""
WITH {_GRID_CTE_DUCK}
SELECT event_type, hour, n_events,
       cast(sum(n_events) OVER w AS bigint) AS moving_sum_24h,
       round(sum(n_events) OVER w * 1.0 / count(*) OVER w, 6)
           AS moving_avg_24h,
       min(n_events) OVER w AS moving_min_24h,
       max(n_events) OVER w AS moving_max_24h
FROM grid
WINDOW w AS (PARTITION BY event_type ORDER BY rn
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
ORDER BY event_type, hour""",
    tags=("timeseries", "window", "moving"),
)
def hourly_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-hour moving sum/avg/min/max of hourly event counts over
    the ZERO-FILLED grid — computing moving stats over the raw (sparse)
    hourly rollup silently skips empty hours and overstates activity; the
    dense grid makes the window truly calendar-24h. Integer sums with an
    exact row-count divisor; partitions are |hours per type|."""
    g = _filled_grid(spark, sf_dir)
    w = (W.partitionBy("event_type").orderBy("rn").rowsBetween(-23, 0))
    return (g.select(
                "event_type", "hour", "n_events",
                F.sum("n_events").over(w).alias("moving_sum_24h"),
                F.round(F.sum("n_events").over(w)
                        / F.count(F.lit(1)).over(w), 6)
                .alias("moving_avg_24h"),
                F.min("n_events").over(w).alias("moving_min_24h"),
                F.max("n_events").over(w).alias("moving_max_24h"))
            .orderBy("event_type", "hour"))


@register(
    "ewma_hourly_counts",
    oracle=f"""
WITH {_GRID_CTE_DUCK},
win AS (
  SELECT event_type, hour, n_events,
         list(n_events) OVER (PARTITION BY event_type ORDER BY rn
                              ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
             AS l
  FROM grid)
SELECT event_type, hour, n_events,
       list_sum(list_transform(range(1, len(l) + 1),
                               i -> l[i] * pow(0.5, len(l) - i + 1)))
           / (1 - pow(0.5, len(l))) AS ewma
FROM win ORDER BY event_type, hour""",
    tags=("timeseries", "smoothing"),
)
def ewma_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2) of the hourly
    event count, truncated to a 16-hour window and renormalized by the
    truncated weight mass. The weights are powers of two, the inputs are
    integers, and every product/sum is therefore an exact dyadic rational in
    IEEE doubles — summation order cannot change the result, so Spark and
    DuckDB produce bit-identical smoothed values with NO rounding step.
    (An untruncated recursive EWMA is a sequential fold — not expressible as
    a distributed window without losing that exactness; the 16-term tail
    carries weight 2^-16, far below any downstream signal.)
    Plan: the window runs over the dense grid (hours x types), never raw
    events; collect_list holds <= 16 integers per row."""
    g = _filled_grid(spark, sf_dir)
    w = (W.partitionBy("event_type").orderBy("rn").rowsBetween(-15, 0))
    arr = F.collect_list("n_events").over(w)
    with_arr = g.select("event_type", "hour", "n_events", arr.alias("l"))
    size = F.size("l")
    weighted = F.transform(
        "l", lambda x, i: x * F.pow(F.lit(0.5), size - i))
    wsum = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    return (with_arr.select(
                "event_type", "hour", "n_events",
                (wsum / (F.lit(1.0) - F.pow(F.lit(0.5), size))).alias("ewma"))
            .orderBy("event_type", "hour"))


@register(
    "sliding_distinct_users_24h",
    oracle="""
WITH p AS (SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id
           FROM events),
hours AS (SELECT DISTINCT hour FROM p)
SELECT h.hour,
       count(DISTINCT p.user_id) AS n_users_24h
FROM hours h
JOIN p ON p.hour BETWEEN h.hour - INTERVAL 23 HOUR AND h.hour
GROUP BY h.hour
ORDER BY h.hour""",
    tags=("timeseries", "window", "distinct"),
)
def sliding_distinct_users_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-24-hour distinct users per hour (the sliding-DAU
    metric). COUNT(DISTINCT) OVER a sliding frame does not exist in either
    engine; the naive range join of every hour against every (hour, user)
    pair is O(|hours| * |pairs|). The scale shape used here: reduce events
    to distinct (hour, user) pairs once, then EXPLODE each pair into the
    <= 24 window endpoints it covers — a bounded 24x fan-out of the
    hour-level rollup (not of raw events) that turns the range join into a
    plain hash aggregate. The oracle cross-checks with the literal range
    join, proving the expansion covers exactly the right windows."""
    e = load_table(spark, sf_dir, "events")
    p = (e.select(F.date_trunc("hour", "ts").alias("hour"), "user_id")
         .distinct())
    hours = p.select("hour").distinct()
    max_hour = hours.agg(F.max("hour").alias("mx"))
    covered = (p.select(
        F.explode(F.expr("sequence(0, 23)")).alias("k"), "hour", "user_id")
        .select(F.expr("hour + make_interval(0, 0, 0, 0, k)")
                .alias("target_hour"), "user_id"))
    in_range = (covered.join(F.broadcast(max_hour))
                .filter(F.col("target_hour") <= F.col("mx"))
                .drop("mx"))
    observed = in_range.join(hours.withColumnRenamed("hour", "target_hour"),
                             "target_hour", "left_semi")
    return (observed.groupBy(F.col("target_hour").alias("hour"))
            .agg(F.countDistinct("user_id").alias("n_users_24h"))
            .orderBy("hour"))
