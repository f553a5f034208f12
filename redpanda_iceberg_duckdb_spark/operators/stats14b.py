"""Round-14 statistics, second batch: Kendall tau-b rank correlation and
the Box-Cox profile-log-likelihood grid — the nonparametric-dependence
and variance-stabilization tools beside Pearson (corr12), Spearman
(stats11), and the monitoring tests in stats14.

Exactness:
- tau-b runs on the dense hourly grid (integer counts; the grid is
  time-range-bounded, so the H^2 pair join is bounded at ANY corpus
  size): concordant/discordant/tie counts are exact bigints; one final
  sqrt + division.
- Box-Cox transforms y = (x^lambda - 1)/lambda (ln x at lambda = 0) are
  snapped per row to a 1e6 lattice; sums of squares ride DECIMAL(38,0)
  (order-free, exact); sum(ln x) rides the micro-nat lattice. Both
  engines read the same stored doubles, so x^0.5/ln carry the repo's
  accepted 1-ulp libm risk only.

Scale stance (100 TB): one map-side-combinable corpus reduction each
(per-hour counts; per-row transform -> global sufficient statistics);
the pair join is grid x grid, not corpus x corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_KX, _KY = "view", "purchase"

_TAU_ORACLE = f"""
WITH h AS (
  SELECT cast(floor(epoch(ts) / 3600) AS bigint) AS hr,
         count(*) FILTER (WHERE event_type = '{_KX}') AS x,
         count(*) FILTER (WHERE event_type = '{_KY}') AS y
  FROM events WHERE event_type IN ('{_KX}', '{_KY}') GROUP BY 1),
b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
spine AS (SELECT g.hr FROM b, lateral (
            SELECT unnest(generate_series(b.lo, b.hi)) AS hr) g),
d AS (SELECT s.hr, coalesce(h.x, 0) AS x, coalesce(h.y, 0) AS y
      FROM spine s LEFT JOIN h USING (hr)),
p AS (
  SELECT sum(CASE WHEN (a.x - c.x) * (a.y - c.y) > 0 THEN 1 ELSE 0 END)
           AS nc,
         sum(CASE WHEN (a.x - c.x) * (a.y - c.y) < 0 THEN 1 ELSE 0 END)
           AS nd,
         sum(CASE WHEN a.x = c.x THEN 1 ELSE 0 END) AS tx,
         sum(CASE WHEN a.y = c.y THEN 1 ELSE 0 END) AS ty,
         count(*) AS n0
  FROM d a JOIN d c ON a.hr < c.hr)
SELECT cast(n0 AS bigint) AS n_pairs, cast(nc AS bigint) AS concordant,
       cast(nd AS bigint) AS discordant,
       round((nc - nd) / sqrt(cast((n0 - tx) AS double) * (n0 - ty)), 6)
         AS tau_b
FROM p"""


@register(
    "kendall_tau_b_hourly",
    oracle=_TAU_ORACLE,
    tags=("statistics", "dependence", "timeseries"),
)
def kendall_tau_b_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between the hourly view-count and purchase-count
    series (dense spine, zero-filled): exact concordant/discordant/tie
    tallies over the bounded hour-pair join, tau_b =
    (nc-nd)/sqrt((n0-tx)(n0-ty))."""
    e = load_table(spark, sf_dir, "events")
    h = (e.filter(F.col("event_type").isin(_KX, _KY))
         .select(F.floor(F.unix_timestamp("ts") / 3600).cast("long")
                 .alias("hr"), "event_type")
         .groupBy("hr")
         .agg(F.count(F.when(F.col("event_type") == _KX, 1)).alias("x"),
              F.count(F.when(F.col("event_type") == _KY, 1)).alias("y")))
    spine = (h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
             .select(F.explode(F.sequence("lo", "hi")).alias("hr")))
    d = (spine.join(h, "hr", "left")
         .select("hr", F.coalesce("x", F.lit(0)).alias("x"),
                 F.coalesce("y", F.lit(0)).alias("y")))
    a = d.select(F.col("hr").alias("ha"), F.col("x").alias("xa"),
                 F.col("y").alias("ya"))
    c = d.select(F.col("hr").alias("hc"), F.col("x").alias("xc"),
                 F.col("y").alias("yc"))
    sgn = (F.col("xa") - F.col("xc")) * (F.col("ya") - F.col("yc"))
    p = (a.join(c, F.col("ha") < F.col("hc"))
         .agg(F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("nc"),
              F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("nd"),
              F.sum(F.when(F.col("xa") == F.col("xc"), 1).otherwise(0))
              .alias("tx"),
              F.sum(F.when(F.col("ya") == F.col("yc"), 1).otherwise(0))
              .alias("ty"),
              F.count(F.lit(1)).alias("n0")))
    return p.select(
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("concordant"),
        F.col("nd").cast("long").alias("discordant"),
        F.round((F.col("nc") - F.col("nd"))
                / F.sqrt((F.col("n0") - F.col("tx")).cast("double")
                         * (F.col("n0") - F.col("ty"))), 6).alias("tau_b"))


_LAMBDAS = ("-1.0", "-0.5", "0.0", "0.5", "1.0")
_LAM_SQL = ",".join(f"({v})" for v in _LAMBDAS)

# Per-row 1e6-snapped transform, shared text between both engines' SQL.
_Y_SNAP = """CASE WHEN lam = 0.0 THEN round(1e6 * ln(x))
     ELSE round(1e6 * (pow(x, lam) - 1.0) / lam) END"""

_BOXCOX_ORACLE = f"""
WITH x AS (SELECT cast(l_extendedprice AS double) AS x FROM lineitem
           WHERE l_extendedprice > 0),
g AS (SELECT lam FROM (VALUES {_LAM_SQL}) l(lam)),
ym AS (SELECT lam, cast({_Y_SNAP} AS bigint) AS y,
              cast(round(1e6 * ln(x)) AS bigint) AS lnx
       FROM x CROSS JOIN g),
s AS (SELECT lam, cast(count(*) AS bigint) AS n,
             cast(sum(y) AS bigint) AS sy,
             sum(cast(y AS decimal(19, 0)) * y) AS syy,
             cast(sum(lnx) AS bigint) AS slnx
      FROM ym GROUP BY lam)
SELECT lam AS lambda,
       round(cast(n * syy - cast(sy AS decimal(19, 0)) * sy AS double)
             / (cast(n AS double) * n) / 1e12, 6) AS sigma2,
       round(-0.5 * n * ln(cast(n * syy - cast(sy AS decimal(19, 0)) * sy
                                AS double)
                           / (cast(n AS double) * n) / 1e12)
             + (lam - 1.0) * (slnx / 1e6), 6) AS loglik
FROM s ORDER BY lambda"""


@register(
    "boxcox_loglik_grid",
    oracle=_BOXCOX_ORACLE,
    tags=("statistics", "feature-engineering"),
)
def boxcox_loglik_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-Cox profile log-likelihood of l_extendedprice over the lambda
    grid (-1, -0.5, 0, 0.5, 1): loglik(lam) = -n/2 ln(sigma^2_lam) +
    (lam-1) sum(ln x), with the transformed values snapped to a 1e6
    lattice and variance built from DECIMAL(38,0)-exact sufficient
    statistics (module docstring). The grid row with max loglik is the
    transform a feature pipeline would pick."""
    li = load_table(spark, sf_dir, "lineitem")
    x = (li.filter(F.col("l_extendedprice") > 0)
         .select(F.col("l_extendedprice").cast("double").alias("x")))
    g = F.explode(F.array(*[F.lit(float(v)) for v in _LAMBDAS])).alias("lam")
    ym = (x.select("x", g)
          .select("lam",
                  F.expr(f"cast({_Y_SNAP} as bigint)").alias("y"),
                  F.expr("cast(round(1e6 * ln(x)) as bigint)").alias("lnx")))
    s = (ym.groupBy("lam")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("y").alias("sy"),
              F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
              .alias("syy"),
              F.sum("lnx").alias("slnx")))
    var_num = (F.col("n") * F.col("syy")
               - F.col("sy").cast("decimal(19,0)") * F.col("sy"))
    sigma2 = (var_num.cast("double")
              / (F.col("n").cast("double") * F.col("n")) / F.lit(1e12))
    return (s.select(
        F.col("lam").alias("lambda"),
        F.round(sigma2, 6).alias("sigma2"),
        F.round(F.lit(-0.5) * F.col("n") * F.log(sigma2)
                + (F.col("lam") - 1.0) * (F.col("slnx") / F.lit(1e6)), 6)
        .alias("loglik"))
        .orderBy("lambda"))
