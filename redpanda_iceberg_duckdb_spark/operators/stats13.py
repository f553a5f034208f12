"""Mahalanobis-distance outliers over (value-cents, hour, iso-weekday) —
the multivariate generalization of the z-score screen (robust.py): a point
can be unremarkable on every marginal yet far from the data cloud once the
covariance couples the axes (a big purchase at 4 AM on a Sunday). The
classic data-quality / anomaly triage before training on event streams.

Exactness: with integer features x and exact integer moments, center and
covariance scale to integers — z = n*x - S (per-axis) and C = n*Sxy -
Sx*Sy (the n^2-scaled covariance) — and

    d^2 = (x-mu)' Sigma^{-1} (x-mu) = z' adj(C) z / det(C)

needs no epsilon anywhere. The adjugate/determinant and the quadratic
form run in DOUBLE over those exact integers (their products overflow
any fixed decimal; double +,*,- are exactly-rounded IEEE ops evaluated
with ONE expression tree shared verbatim by both engines — the
glm12/ridge12 discipline), then d^2 is rounded once to 6 dp.

Scale stance (100 TB): one combinable 9-moment aggregate (KB to the
driver-free broadcast), one map-side pass computing d^2 per row against
the broadcast 1-row moment frame, TakeOrderedAndProject for the top-k —
no shuffle beyond the aggregate's, no window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_TOP = 20

# n^2-scaled covariance entries from the raw integer moments (exact
# integers; computed on decimal(38,0)/hugeint).
_C = {
    "c11": "(n * s11 - s1 * s1)", "c12": "(n * s12 - s1 * s2)",
    "c13": "(n * s13 - s1 * s3)", "c22": "(n * s22 - s2 * s2)",
    "c23": "(n * s23 - s2 * s3)", "c33": "(n * s33 - s3 * s3)",
}
# Double-precision adjugate/determinant over the exact C integers — the
# SAME text in Spark and DuckDB (IEEE ops, fixed tree => identical bits).
_DBL = {k: f"cast({v} AS double)" for k, v in _C.items()}
_ADJ = {
    "a11": "({c22} * {c33} - {c23} * {c23})",
    "a22": "({c11} * {c33} - {c13} * {c13})",
    "a33": "({c11} * {c22} - {c12} * {c12})",
    "a12": "(-({c12} * {c33} - {c13} * {c23}))",
    "a13": "({c12} * {c23} - {c13} * {c22})",
    "a23": "(-({c11} * {c23} - {c13} * {c12}))",
}
_ADJ = {k: v.format(**_DBL) for k, v in _ADJ.items()}
_DET = ("({c11} * ({c22} * {c33} - {c23} * {c23})"
        " - {c12} * ({c12} * {c33} - {c23} * {c13})"
        " + {c13} * ({c12} * {c23} - {c22} * {c13}))").format(**_DBL)
# z' adj(C) z / det(C), z cast to double once per axis.
_D2 = (f"(({_ADJ['a11']} * zd1 * zd1 + {_ADJ['a22']} * zd2 * zd2"
       f" + {_ADJ['a33']} * zd3 * zd3"
       f" + 2 * ({_ADJ['a12']} * zd1 * zd2 + {_ADJ['a13']} * zd1 * zd3"
       f" + {_ADJ['a23']} * zd2 * zd3)) / {_DET})")

_MAHA_ORACLE = f"""
WITH pts AS (SELECT event_id,
                    cast(round(value * 100) AS bigint) AS x1,
                    cast(extract(hour FROM ts) AS bigint) AS x2,
                    cast(extract(isodow FROM ts) AS bigint) AS x3
             FROM events),
m AS (SELECT cast(count(*) AS hugeint) AS n,
             cast(sum(x1) AS hugeint) AS s1, cast(sum(x2) AS hugeint) AS s2,
             cast(sum(x3) AS hugeint) AS s3,
             cast(sum(cast(x1 AS hugeint) * x1) AS hugeint) AS s11,
             cast(sum(cast(x1 AS hugeint) * x2) AS hugeint) AS s12,
             cast(sum(cast(x1 AS hugeint) * x3) AS hugeint) AS s13,
             cast(sum(cast(x2 AS hugeint) * x2) AS hugeint) AS s22,
             cast(sum(cast(x2 AS hugeint) * x3) AS hugeint) AS s23,
             cast(sum(cast(x3 AS hugeint) * x3) AS hugeint) AS s33
      FROM pts),
d AS (SELECT event_id,
             cast(cast(n * x1 - s1 AS hugeint) AS double) AS zd1,
             cast(cast(n * x2 - s2 AS hugeint) AS double) AS zd2,
             cast(cast(n * x3 - s3 AS hugeint) AS double) AS zd3,
             n, s1, s2, s3, s11, s12, s13, s22, s23, s33
      FROM pts, m)
SELECT event_id, round({_D2}, 6) AS d2
FROM d ORDER BY d2 DESC, event_id LIMIT {_TOP}"""


@register(
    "mahalanobis_outliers_topk",
    oracle=_MAHA_ORACLE,
    tags=("statistics", "anomaly", "data-quality"),
)
def mahalanobis_outliers_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP} events by exact-moment Mahalanobis distance over
    (value cents, hour, iso weekday) — module docstring has the integer
    scaling that removes every epsilon."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x1"),
        F.hour("ts").cast("long").alias("x2"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("long").alias("x3"))
    m = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x1").cast(dec).alias("s1"),
        F.sum("x2").cast(dec).alias("s2"),
        F.sum("x3").cast(dec).alias("s3"),
        F.sum(F.col("x1").cast(dec) * F.col("x1")).alias("s11"),
        F.sum(F.col("x1").cast(dec) * F.col("x2")).alias("s12"),
        F.sum(F.col("x1").cast(dec) * F.col("x3")).alias("s13"),
        F.sum(F.col("x2").cast(dec) * F.col("x2")).alias("s22"),
        F.sum(F.col("x2").cast(dec) * F.col("x3")).alias("s23"),
        F.sum(F.col("x3").cast(dec) * F.col("x3")).alias("s33"))
    d = (pts.crossJoin(F.broadcast(m))
         .selectExpr("event_id",
                     "cast(n * x1 - s1 AS double) AS zd1",
                     "cast(n * x2 - s2 AS double) AS zd2",
                     "cast(n * x3 - s3 AS double) AS zd3",
                     "n", "s1", "s2", "s3",
                     "s11", "s12", "s13", "s22", "s23", "s33"))
    return (d.selectExpr("event_id", f"round({_D2}, 6) AS d2")
            .orderBy(F.desc("d2"), "event_id").limit(_TOP))
