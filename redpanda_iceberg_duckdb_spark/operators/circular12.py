"""Circular (directional) statistics for time-of-day: WHEN do purchases
happen, answered correctly. The arithmetic mean of hours is wrong on a
circle (23:00 and 01:00 average to noon); the circular mean — the angle
of the summed unit vectors — and the resultant length R (1 = perfectly
concentrated, 0 = uniform around the clock) are the right invariants,
plus Rayleigh's z = n*R^2 as the uniformity test statistic.

Engine-neutral trig via the literal-constants discipline (cf. hyperplane
LSH's sign literals): hours take only 24 values, so sin/cos of the 24
angles are precomputed in PYTHON, scaled to exact micro-integers, and
embedded as CASE literals in BOTH engines' plans. Vector sums are then
exact bigint arithmetic; atan2/sqrt run once on the identical final
integers. No engine libm call ever touches per-row data.

Scale: one groupBy(hour) over the event scan (24 rows out), then
constant arithmetic. The hour histogram is the sufficient statistic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_SIN = {h: round(math.sin(2 * math.pi * h / 24) * 1_000_000)
        for h in range(24)}
_COS = {h: round(math.cos(2 * math.pi * h / 24) * 1_000_000)
        for h in range(24)}


def _case(table: dict[int, int], col: str) -> str:
    whens = " ".join(f"WHEN {h} THEN {v}" for h, v in table.items())
    return f"(CASE {col} {whens} END)"


_CIRC_ORACLE = f"""
WITH h AS (SELECT cast(extract(hour FROM ts) AS bigint) AS hr,
                  cast(count(*) AS bigint) AS n
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
v AS (SELECT cast(sum(n) AS bigint) AS n,
             cast(sum(n * {_case(_SIN, 'hr')}) AS bigint) AS s,
             cast(sum(n * {_case(_COS, 'hr')}) AS bigint) AS c
      FROM h)
SELECT n AS n_purchases,
       round(sqrt(cast(s AS double) * s + cast(c AS double) * c)
             / (n * 1e6), 6) AS resultant_r,
       round((24 / (2 * pi())) *
             CASE WHEN atan2(cast(s AS double), cast(c AS double)) >= 0
                  THEN atan2(cast(s AS double), cast(c AS double))
                  ELSE atan2(cast(s AS double), cast(c AS double))
                       + 2 * pi() END, 6) AS mean_hour,
       round(n * (sqrt(cast(s AS double) * s + cast(c AS double) * c)
                  / (n * 1e6))
               * (sqrt(cast(s AS double) * s + cast(c AS double) * c)
                  / (n * 1e6)), 6) AS rayleigh_z
FROM v"""


@register(
    "circular_hour_stats",
    oracle=_CIRC_ORACLE,
    tags=("statistics", "circular", "timeseries"),
)
def circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular mean purchase hour, resultant length R, and Rayleigh z
    over the 24-hour clock, trig as shared micro-integer literals
    (module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    h = (ev.filter(F.col("event_type") == "purchase")
         .groupBy(F.hour("ts").cast("long").alias("hr"))
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    v = h.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("n") * F.expr(_case(_SIN, "hr"))).cast("long").alias("s"),
        F.sum(F.col("n") * F.expr(_case(_COS, "hr"))).cast("long").alias("c"))
    r_expr = ("sqrt(cast(s AS double) * s + cast(c AS double) * c)"
              " / (n * 1e6)")
    ang = "atan2(cast(s AS double), cast(c AS double))"
    return v.selectExpr(
        "n AS n_purchases",
        f"round({r_expr}, 6) AS resultant_r",
        f"round((24 / (2 * pi())) * CASE WHEN {ang} >= 0 THEN {ang} "
        f"ELSE {ang} + 2 * pi() END, 6) AS mean_hour",
        f"round(n * ({r_expr}) * ({r_expr}), 6) AS rayleigh_z")
