"""Trend and seasonality STRENGTH of the hourly event series — Hyndman's
variance-ratio decomposition (the one-number answers to "is this series
trending?" / "is it periodic?" that the ACF/Mann-Kendall/chi2 family
implies but never states):

    F_trend    = max(0, 1 - Var(R) / Var(T + R))
    F_seasonal = max(0, 1 - Var(R) / Var(S + R))

over series = T + S + R with T a centered 25-hour moving average, S the
hour-of-day means of the detrended series, R the remainder.

Lattice discipline: the MA mean and hour-of-day means are snapped to
integer micros with the shared half-up div (both engines' integer
division truncates toward zero — probed in boost13 — so signed snaps
stay bit-identical); T/S/R are then exact micro integers, variances are
exact (n*sum(x^2) - sum(x)^2 on decimal/hugeint), and each strength is
one double division. Only hours with a FULL +-12 window enter the
analysis (both engines drop the same 24 edge rows).

Scale stance (100 TB): the corpus reduces once to the time-range-bounded
hourly grid; the moving average is a grid-to-grid band join (|i-j| <=
12) on broadcast frames, the seasonal means one 24-row aggregate —
no window at all, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000
_HALF = 12          # centered MA half-width -> 25-hour window

_STL_ORACLE = f"""
WITH hc AS (SELECT epoch_us(ts) // {_HOUR_US} AS h,
                   cast(count(*) AS bigint) AS c
            FROM events GROUP BY 1),
b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
grid AS (SELECT g.h, coalesce(hc.c, 0) AS c
         FROM (SELECT unnest(generate_series((SELECT h0 FROM b),
                                             (SELECT h1 FROM b))) AS h) g
         LEFT JOIN hc ON hc.h = g.h),
ma AS (SELECT g1.h, g1.c,
              sum(g2.c) AS s25, cast(count(*) AS bigint) AS nw
       FROM grid g1 JOIN grid g2
         ON g2.h BETWEEN g1.h - {_HALF} AND g1.h + {_HALF}
       GROUP BY g1.h, g1.c
       HAVING count(*) = {2 * _HALF + 1}),
dt AS (SELECT h, (h % 24) AS hod,
              1000000 * c
              - (2000000 * s25 + {2 * _HALF + 1})
                // (2 * {2 * _HALF + 1}) AS d
       FROM ma),
sh AS (SELECT hod, (2 * sum(d) + count(*)) // (2 * count(*)) AS s
       FROM dt GROUP BY hod),
rr AS (SELECT dt.h, dt.d, dt.d - sh.s AS r,
              (SELECT 1000000 * ma.c FROM ma WHERE ma.h = dt.h)
              - sh.s AS ds
       FROM dt JOIN sh ON sh.hod = dt.hod),
v AS (SELECT cast(count(*) AS hugeint) AS n,
             cast(sum(cast(r AS hugeint) * r) AS hugeint) AS srr,
             cast(sum(r) AS hugeint) AS sr,
             cast(sum(cast(d AS hugeint) * d) AS hugeint) AS sdd,
             cast(sum(d) AS hugeint) AS sd,
             cast(sum(cast(ds AS hugeint) * ds) AS hugeint) AS sss,
             cast(sum(ds) AS hugeint) AS ss
      FROM rr)
SELECT cast(n AS bigint) AS n_hours,
       round(greatest(0.0, 1 - cast(n * srr - sr * sr AS double)
                             / cast(n * sss - ss * ss AS double)), 6)
         AS trend_strength,
       round(greatest(0.0, 1 - cast(n * srr - sr * sr AS double)
                             / cast(n * sdd - sd * sd AS double)), 6)
         AS seasonal_strength
FROM v"""


@register(
    "seasonality_strength_hourly",
    oracle=_STL_ORACLE,
    tags=("timeseries", "decomposition", "statistics"),
)
def seasonality_strength_hourly(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """(n_hours, trend_strength, seasonal_strength) of the hourly event
    series under the exact-lattice variance decomposition (module
    docstring)."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    hc = (ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
          .groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c")))
    b = hc.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (b.select(F.explode(F.sequence("h0", "h1")).alias("h"))
            .join(hc, "h", "left_outer")
            .select("h", F.coalesce("c", F.lit(0)).alias("c"))
            .localCheckpoint(eager=True))   # band-joined against itself
    win = 2 * _HALF + 1
    ma = (grid.alias("g1")
          .join(F.broadcast(grid.alias("g2")),
                (F.col("g2.h") >= F.col("g1.h") - _HALF)
                & (F.col("g2.h") <= F.col("g1.h") + _HALF))
          .groupBy(F.col("g1.h").alias("h"), F.col("g1.c").alias("c"))
          .agg(F.sum("g2.c").alias("s25"), F.count(F.lit(1)).alias("nw"))
          .filter(F.col("nw") == win))
    dt = ma.selectExpr(
        "h", "c", "h % 24 AS hod",
        f"1000000 * c - (2000000 * s25 + {win}) div (2 * {win}) AS d")
    sh = dt.groupBy("hod").agg(
        F.expr("(2 * sum(d) + count(*)) div (2 * count(*))").alias("s"))
    rr = (dt.join(F.broadcast(sh), "hod")
          .selectExpr("d", "d - s AS r", "1000000 * c - s AS ds"))
    v = rr.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.expr(f"cast(r AS {dec}) * r")).alias("srr"),
        F.sum("r").cast(dec).alias("sr"),
        F.sum(F.expr(f"cast(d AS {dec}) * d")).alias("sdd"),
        F.sum("d").cast(dec).alias("sd"),
        F.sum(F.expr(f"cast(ds AS {dec}) * ds")).alias("sss"),
        F.sum("ds").cast(dec).alias("ss"))
    return v.selectExpr(
        "cast(n AS bigint) AS n_hours",
        "round(greatest(0.0, 1 - cast(n * srr - sr * sr AS double)"
        " / cast(n * sss - ss * ss AS double)), 6) AS trend_strength",
        "round(greatest(0.0, 1 - cast(n * srr - sr * sr AS double)"
        " / cast(n * sdd - sd * sd AS double)), 6) AS seasonal_strength")
