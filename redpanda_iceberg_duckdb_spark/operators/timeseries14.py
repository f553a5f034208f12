"""Holt-Winters ADDITIVE SEASONAL smoothing of the hourly event series —
the seasonal completion of Holt linear (timeseries13): level + trend +
a 24-slot additive seasonal state, alpha = beta = gamma = 1/2 on the
micro lattice with explicit floor-halving, so both engines walk
bit-identical integer states:

    e_t = 1e6*y_t - (l_{t-1} + b_{t-1} + s_{t-24})     (forecast error)
    l_t = floor((1e6*y_t - s_{t-24} + l_{t-1} + b_{t-1}) / 2)
    b_t = floor(((l_t - l_{t-1}) + b_{t-1}) / 2)
    s_t = floor((1e6*y_t - l_t + s_{t-24}) / 2)

Initialization (classic, stated exactly): after the first 24 hours,
l = floor(mean of 1e6*y_0..y_23), b = 0, s_i = 1e6*y_i - l. The
recurrence starts at t = 24.

The DuckDB oracle is a recursive CTE whose working row carries the
seasonal state as a 24-column SHIFT REGISTER (s1 = oldest .. s24 =
newest): each step consumes s1, shifts the register left, and appends
the freshly-updated seasonal — the technique that lets a recursive CTE
walk a recurrence whose state is a fixed-length vector, not a scalar
(recursive arms only see the previous iteration, so the lookback buffer
must ride along as columns).

Scale stance (100 TB): identical to holt_linear — ONE bucketed count
aggregate reduces the corpus to the time-range-bounded hourly grid; the
inherently-sequential fold then runs driver-side on the collected grid
(curve-sized, the offsets-table convention; a linear recurrence over
time is the one operator class where distributing adds nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000
_M = 24


def _hw_oracle() -> str:
    seas_init = ", ".join(
        f"cast(1000000 * (SELECT c FROM g2 WHERE t = {j - 1}) "
        f"- (SELECT l0 FROM init) AS bigint) AS s{j}" for j in range(1, _M + 1))
    shift = ", ".join(f"m.s{j + 1} AS s{j}" for j in range(1, _M))
    carry = ", ".join(f"it.s{j}" for j in range(1, _M + 1))
    return f"""
WITH RECURSIVE hc AS (SELECT epoch_us(ts) // {_HOUR_US} AS h,
                             cast(count(*) AS bigint) AS c
                      FROM events GROUP BY 1),
bnd AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
grid AS (SELECT g.h, coalesce(hc.c, 0) AS c
         FROM (SELECT unnest(generate_series((SELECT h0 FROM bnd),
                                             (SELECT h1 FROM bnd))) AS h) g
         LEFT JOIN hc ON hc.h = g.h),
g2 AS (SELECT row_number() OVER (ORDER BY h) - 1 AS t, c FROM grid),
init AS (SELECT cast(sum(1000000 * c) // {_M} AS bigint) AS l0
         FROM g2 WHERE t < {_M}),
it AS (
  SELECT {_M - 1} AS t, (SELECT l0 FROM init) AS l, cast(0 AS bigint) AS b,
         cast(0 AS hugeint) AS sse, {seas_init}
  UNION ALL
  SELECT m.t, m.l2, cast(floor(((m.l2 - m.l) + m.b) / 2.0) AS bigint),
         m.sse + cast(m.e AS hugeint) * m.e,
         {shift},
         cast(floor((m.y - m.l2 + m.s1) / 2.0) AS bigint) AS s24
  FROM (SELECT g.t, 1000000 * g.c AS y, it.l, it.b, it.sse, {carry},
               1000000 * g.c - (it.l + it.b + it.s1) AS e,
               cast(floor((1000000 * g.c - it.s1 + it.l + it.b) / 2.0)
                    AS bigint) AS l2
        FROM it JOIN g2 g ON g.t = it.t + 1) m),
fin AS (SELECT * FROM it WHERE t = (SELECT max(t) FROM it))
SELECT (SELECT cast(count(*) AS bigint) FROM g2) AS n_hours,
       l AS level_micro, b AS trend_micro, s24 AS season_micro,
       round(sqrt(cast(sse AS double)
                  / (SELECT count(*) - {_M} FROM g2)) / 1e6, 6) AS rmse
FROM fin"""


@register(
    "holt_winters_seasonal_hourly",
    oracle=_hw_oracle(),
    tags=("timeseries", "forecast", "smoothing", "seasonal", "iterative"),
)
def holt_winters_seasonal_hourly(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Final Holt-Winters level/trend/newest-seasonal state (micro
    lattice) and one-step-ahead RMSE over hours >= 24 (module docstring);
    the oracle's recursive CTE walks the identical recurrence with the
    seasonal state as a 24-column shift register."""
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).alias("c")))
    spine = (hc.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
             .select(F.explode(F.sequence("lo", "hi")).alias("h")))
    grid = (spine.join(hc, "h", "left")
            .select("h", F.coalesce("c", F.lit(0)).alias("c"))
            .orderBy("h"))
    # Curve rows are time-range-bounded — the offsets-table collect; the
    # sequential fold below is pure grid math (holt_linear's stance).
    ys = [int(r["c"]) for r in grid.collect()]
    n = len(ys)
    if n <= _M:
        raise ValueError(f"need more than {_M} hours, got {n}")
    l = sum(1_000_000 * y for y in ys[:_M]) // _M
    b = 0
    seas = [1_000_000 * y - l for y in ys[:_M]]   # seas[0] = oldest
    sse = 0
    import math

    for t in range(_M, n):
        y = 1_000_000 * ys[t]
        s_old = seas[0]
        e = y - (l + b + s_old)
        sse += e * e
        l2 = math.floor((y - s_old + l + b) / 2.0)
        b = math.floor(((l2 - l) + b) / 2.0)
        s_new = math.floor((y - l2 + s_old) / 2.0)
        l = l2
        seas = seas[1:] + [s_new]
    # float(sse) FIRST, then divide — the oracle's cast(sse AS double)
    # rounds the hugeint to double before the division; Python's int/int
    # true division would round the exact quotient instead (differs in
    # the last ulp once sse exceeds 2^53).
    return spark.createDataFrame(
        [(n, l, b, seas[-1],
          float(round(math.sqrt(float(sse) / (n - _M)) / 1e6, 6)))],
        "n_hours long, level_micro long, trend_micro long, "
        "season_micro long, rmse double")
