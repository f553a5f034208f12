"""Quantile treatment effects: the weekday-vs-weekend purchase-value
contrast at every decile — the distributional readout an average
treatment effect hides (a mean shift can be a uniform lift OR a fat
right tail; the QTE curve tells them apart). The causal-eval sibling of
the CUPED/diff-in-diff family, on exact order statistics.

Quantiles are EXACT lower order statistics: rank r_k = ceil(k/10 * n) =
(n*k + 9) div 10 on integers, value = the r_k-th smallest cents value
(ties in value share the value, so tiebreak order is irrelevant) — no
interpolation, no engine quantile function (Spark percentile and DuckDB
quantile_cont interpolate DIFFERENTLY; rank selection cannot disagree).

Scale stance (100 TB): one filter+projection pass, a per-GROUP
row_number window (partitioned — two partitions, each a sort of that
group's purchases; at real scale swap for the two-phase offsets pattern
in scale8.py), one broadcast 2-row count frame, one 18-row target join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_QTE_ORACLE = """
WITH pts AS (SELECT CASE WHEN extract(isodow FROM ts) <= 5
                         THEN 1 ELSE 0 END AS wd,
                    cast(round(value * 100) AS bigint) AS x
             FROM events WHERE event_type = 'purchase'),
rk AS (SELECT wd, x,
              row_number() OVER (PARTITION BY wd ORDER BY x) AS rn
       FROM pts),
n AS (SELECT wd, cast(count(*) AS bigint) AS n FROM pts GROUP BY wd),
tgt AS (SELECT n.wd, k.k, (n.n * k.k + 9) // 10 AS r
        FROM n, (SELECT unnest(range(1, 10)) AS k) k),
v AS (SELECT tgt.k, tgt.wd, rk.x
      FROM tgt JOIN rk ON rk.wd = tgt.wd AND rk.rn = tgt.r)
SELECT cast(a.k AS int) AS decile,
       round(a.x / 100.0, 6) AS weekday_value,
       round(b.x / 100.0, 6) AS weekend_value,
       round((a.x - b.x) / 100.0, 6) AS qte
FROM v a JOIN v b ON a.k = b.k AND a.wd = 1 AND b.wd = 0
ORDER BY decile"""


@register(
    "qte_value_weekday_weekend",
    oracle=_QTE_ORACLE,
    tags=("statistics", "causal", "quantiles"),
)
def qte_value_weekday_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile QTE curve of purchase value, weekday minus weekend
    (module docstring): (decile, weekday_value, weekend_value, qte)."""
    ev = load_table(spark, sf_dir, "events")
    pts = (ev.filter(F.col("event_type") == "purchase")
           .select((F.expr("extract(DAYOFWEEK_ISO FROM ts)") <= 5)
                   .cast("int").alias("wd"),
                   F.round(F.col("value") * 100).cast("long").alias("x")))
    rk = pts.select("wd", "x",
                    F.row_number().over(
                        W.partitionBy("wd").orderBy("x")).alias("rn"))
    n = pts.groupBy("wd").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ks = spark.range(1, 10).select(F.col("id").cast("int").alias("k"))
    tgt = (n.crossJoin(F.broadcast(ks))
           .select("wd", "k", F.expr("(n * k + 9) div 10").alias("r")))
    v = rk.join(F.broadcast(tgt),
                (rk.wd == tgt.wd) & (rk.rn == tgt.r)).select(
        "k", rk.wd.alias("grp"), "x")
    a = v.filter("grp = 1").select("k", F.col("x").alias("xa"))
    b = v.filter("grp = 0").select("k", F.col("x").alias("xb"))
    return (a.join(b, "k")
            .select(F.col("k").alias("decile"),
                    F.round(F.col("xa") / 100.0, 6).alias("weekday_value"),
                    F.round(F.col("xb") / 100.0, 6).alias("weekend_value"),
                    F.round((F.col("xa") - F.col("xb")) / 100.0, 6)
                    .alias("qte"))
            .orderBy("decile"))
