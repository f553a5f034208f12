"""Holt linear (double exponential) smoothing of the hourly event-count
series — level + trend state with one-step-ahead forecast error, the
classic workload-forecasting primitive that the EWMA query
(ewma_hourly_counts) lacks a trend term for. alpha = beta = 1/2, and the
recurrence runs on the MICRO lattice with explicit floor-halving so both
engines walk bit-identical states:

    l_t = floor((1e6*y_t + l_{t-1} + b_{t-1}) / 2)
    b_t = floor(((l_t - l_{t-1}) + b_{t-1}) / 2)
    e_t = 1e6*y_t - (l_{t-1} + b_{t-1})        (pre-update forecast error)

(floor() over a /2.0 double division in both engines — truncating integer
division differs between them on negatives, floor does not; magnitudes
stay far below 2^53 so the division is exact.)

A linear recurrence over time is inherently sequential — the one operator
class where "let Catalyst parallelize" has no answer — but the SERIES is
time-range-bounded (one row per hour), so the scale-correct shape is:
distribute the reduction TO the grid (one bucketed count aggregate over
the corpus — the only data-sized work), then fold the few-hundred-element
grid in a single aggregate() expression over the collected array (the
offsets-table pattern; KBs). The DuckDB oracle is a recursive CTE walking
the identical lattice recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000

_HOLT_ORACLE = f"""
WITH RECURSIVE hc AS (SELECT epoch_us(ts) // {_HOUR_US} AS h,
                             cast(count(*) AS bigint) AS c
                      FROM events GROUP BY 1),
bnd AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
grid AS (SELECT g.h, coalesce(hc.c, 0) AS c
         FROM (SELECT unnest(generate_series((SELECT h0 FROM bnd),
                                             (SELECT h1 FROM bnd))) AS h) g
         LEFT JOIN hc ON hc.h = g.h),
g2 AS (SELECT row_number() OVER (ORDER BY h) - 1 AS t, c FROM grid),
it AS (
  SELECT 0 AS t, cast(1000000 * c AS bigint) AS l, cast(0 AS bigint) AS b,
         cast(0 AS hugeint) AS sse
  FROM g2 WHERE t = 0
  UNION ALL
  SELECT s.t, cast(floor((1000000 * s.c + s.l + s.b) / 2.0) AS bigint) AS l2,
         cast(floor(((cast(floor((1000000 * s.c + s.l + s.b) / 2.0)
                      AS bigint) - s.l) + s.b) / 2.0) AS bigint),
         s.sse + cast(1000000 * s.c - (s.l + s.b) AS hugeint)
               * cast(1000000 * s.c - (s.l + s.b) AS hugeint)
  FROM (SELECT g.t, g.c, it.l, it.b, it.sse
        FROM it JOIN g2 g ON g.t = it.t + 1) s),
fin AS (SELECT * FROM it WHERE t = (SELECT max(t) FROM it))
SELECT (SELECT cast(count(*) AS bigint) FROM g2) AS n_hours,
       l AS level_micro, b AS trend_micro,
       round(sqrt(cast(sse AS double)
                  / (SELECT count(*) - 1 FROM g2)) / 1e6, 6) AS rmse
FROM fin"""


@register(
    "holt_linear_hourly",
    oracle=_HOLT_ORACLE,
    tags=("timeseries", "forecast", "smoothing"),
)
def holt_linear_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Holt level/trend state (micro lattice) and one-step-ahead
    forecast RMSE over the zero-filled hourly series (module docstring);
    the oracle's recursive CTE walks the identical recurrence."""
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c")))
    bnd = hc.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (bnd.select(F.explode(F.sequence("h0", "h1")).alias("h"))
            .join(hc, "h", "left_outer")
            .select("h", F.coalesce("c", F.lit(0)).alias("c")))
    arr = grid.agg(F.array_sort(F.collect_list(F.struct("h", "c")))
                   .alias("a"))
    # Single fold over the bounded grid: accumulator (t, l, b, sse); t < 0
    # marks "uninitialized" so the first element seeds the state.
    fold = F.expr("""
      aggregate(
        a,
        struct(cast(-1 AS bigint) AS t, cast(0 AS bigint) AS l,
               cast(0 AS bigint) AS b, cast(0 AS decimal(38,0)) AS sse),
        (acc, x) -> CASE WHEN acc.t < 0 THEN
            struct(cast(0 AS bigint) AS t,
                   cast(1000000 * x.c AS bigint) AS l,
                   cast(0 AS bigint) AS b,
                   cast(0 AS decimal(38,0)) AS sse)
          ELSE
            struct(acc.t + 1 AS t,
                   cast(floor((1000000 * x.c + acc.l + acc.b) / 2.0)
                        AS bigint) AS l,
                   cast(floor(((cast(floor((1000000 * x.c + acc.l + acc.b)
                                            / 2.0) AS bigint) - acc.l)
                               + acc.b) / 2.0) AS bigint) AS b,
                   acc.sse
                   + cast((1000000 * x.c - (acc.l + acc.b))
                          * (1000000 * x.c - (acc.l + acc.b))
                          AS decimal(38,0)) AS sse)
          END)
    """).alias("f")
    return (arr.select(F.size("a").cast("long").alias("n_hours"), fold)
            .select("n_hours",
                    F.col("f.l").alias("level_micro"),
                    F.col("f.b").alias("trend_micro"),
                    F.round(F.sqrt(F.col("f.sse").cast("double")
                                   / (F.col("n_hours") - 1)) / 1e6, 6)
                     .alias("rmse")))
