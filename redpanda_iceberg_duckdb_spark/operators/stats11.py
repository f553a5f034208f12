"""Round-11 inference additions: the four classical tests that close the
remaining gaps in the eval tier — a nonparametric TREND test
(Mann-Kendall; the hypothesis-test companion of the Theil-Sen slope in
robust_trend.py), a rank CORRELATION (Spearman via midranks; the
monotone-association companion of Kruskal-Wallis' rank machinery), a
VARIANCE-homogeneity test (Brown-Forsythe 1974, the median-centered
Levene — the assumption check ANOVA consumers actually run first), and a
PAIRED-proportions test (McNemar 1947 — the before/after flip test an
experiment platform runs on per-user conversion).

Exactness discipline (the stats10b/c lattice rules):
- Mann-Kendall's S and the x18-scaled variance are pure integers
  (sign pairs; n(n-1)(2n+5) - sum over tie runs t(t-1)(2t+5)); the only
  floats are one division by 18 and one IEEE-correctly-rounded sqrt,
  identical cross-engine.
- Spearman rides DOUBLED midranks (exact integers even for tied runs,
  stats10c's trick) through Pearson's cross-moment formula on
  decimal(38,0); the two variance factors go through sqrt separately so
  no intermediate exceeds 38 digits.
- Brown-Forsythe centers each group at its DOUBLED median (the 2-point
  order-statistic sum — an exact integer whether n_h is odd or even),
  takes integer absolute deviations, and reuses the ANOVA fixed-point
  lattice (floor(s^2 * 1e15 / n), order-insensitive integer sums).
- McNemar is counting: b (yes->no) and c (no->yes) flips over per-user
  purchase indicators for the two halves of the month; the
  continuity-corrected statistic (|b-c|-1)^2/(b+c) is one division.

Scale stance (100 TB):
- Every test reduces to sufficient statistics with ONE combinable
  full-data aggregate (per-hour counts, per-(type,cents) counts,
  per-user half-indicators); everything downstream is series-/
  bucket-/group-cardinality. Mann-Kendall's pair join runs on the
  thinned hourly series (robust_trend.thin_series, <= 2048 points per
  series — the same enforced guard, mirrored in the oracle).
- Spearman's midranks use the two-phase bucketed cumulation of
  stats10c (no global single-partition window over data-sized frames);
  the hour-of-day side has 24 distinct values per type and stays tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .robust_trend import _MAX_POINTS, thin_series

_BUCKET = 2048          # cents per midrank bucket (stats10c discipline)
_SCALE = 10 ** 15       # Brown-Forsythe fixed-point lattice (stats10b)

# Shared oracle CTE: thinned hourly counts per event type — identical
# arithmetic to robust_trend's oracle so the guard can never fork.
_HOURLY_THINNED = f"""
hourly0 AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1, 2),
hourly AS (
  SELECT event_type, h, c FROM (
    SELECT event_type, h, c,
           row_number() OVER (PARTITION BY event_type ORDER BY h) - 1
             AS rn,
           count(*) OVER (PARTITION BY event_type) AS len
    FROM hourly0)
  WHERE rn % cast(ceil(len / {_MAX_POINTS}.0) AS bigint) = 0)"""


def _mk_oracle() -> str:
    return f"""
WITH {_HOURLY_THINNED},
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sg
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND b.h > a.h),
s AS (SELECT event_type, sum(sg) AS s_stat FROM pairs GROUP BY 1),
npts AS (SELECT event_type, count(*) AS n FROM hourly GROUP BY 1),
ties AS (
  SELECT event_type,
         sum(t * (t - 1) * (2 * t + 5)) AS tie18
  FROM (SELECT event_type, c, count(*) AS t FROM hourly GROUP BY 1, 2)
  GROUP BY 1),
v AS (
  SELECT n.event_type, n.n, s.s_stat,
         n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie18 AS var18
  FROM npts n JOIN s USING (event_type) JOIN ties USING (event_type))
SELECT event_type, cast(n AS bigint) AS n_points,
       cast(s_stat AS bigint) AS s_stat,
       cast(var18 AS bigint) AS var_s18,
       round(CASE WHEN var18 = 0 THEN 0.0
                  WHEN s_stat > 0
                    THEN (s_stat - 1) / sqrt(var18 / 18.0)
                  WHEN s_stat < 0
                    THEN (s_stat + 1) / sqrt(var18 / 18.0)
                  ELSE 0.0 END, 6) AS z_mk
FROM v ORDER BY event_type"""


@register(
    "mann_kendall_trend",
    oracle=_mk_oracle(),
    tags=("robust", "trend", "statistics", "scale-pattern"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_points, s_stat, var_s18, z_mk): Mann-Kendall trend
    test per event type over the (thinned) hourly count series — S from
    exact sign pairs, tie-corrected variance carried x18 as an integer,
    one sqrt for the continuity-corrected z (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    hourly = thin_series(
        (e.groupBy("event_type",
                   F.expr("unix_micros(ts) div 3600000000").alias("h"))
         .agg(F.count(F.lit(1)).alias("c"))),
        "event_type", "h")
    a = hourly.select("event_type", F.col("h").alias("h1"),
                      F.col("c").alias("c1"))
    b = hourly.select("event_type", F.col("h").alias("h2"),
                      F.col("c").alias("c2"))
    s = (a.join(b, ["event_type"])
         .filter(F.col("h2") > F.col("h1"))
         .select("event_type",
                 F.when(F.col("c2") > F.col("c1"), 1)
                 .when(F.col("c2") < F.col("c1"), -1)
                 .otherwise(0).alias("sg"))
         .groupBy("event_type").agg(F.sum("sg").alias("s_stat")))
    npts = hourly.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (hourly.groupBy("event_type", "c")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("event_type")
            .agg(F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).alias("tie18")))
    v = (npts.join(s, "event_type").join(ties, "event_type")
         .withColumn("var18",
                     F.col("n") * (F.col("n") - 1)
                     * (2 * F.col("n") + 5) - F.col("tie18")))
    sd = F.sqrt(F.col("var18") / 18.0)
    return (v.select(
        "event_type", F.col("n").cast("long").alias("n_points"),
        F.col("s_stat").cast("long").alias("s_stat"),
        F.col("var18").cast("long").alias("var_s18"),
        F.round(
            F.when(F.col("var18") == 0, 0.0)
            .when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
            .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
            .otherwise(0.0), 6).alias("z_mk"))
        .orderBy("event_type"))


def _spearman_oracle() -> str:
    return """
WITH v AS (
  SELECT event_type, cast(floor(value * 100) AS bigint) AS cents,
         (epoch_us(ts) // 3600000000) % 24 AS hod
  FROM events),
xg AS (SELECT event_type, cents, count(*) AS t FROM v GROUP BY 1, 2),
xmr AS (  -- doubled midrank of each cents run, per type
  SELECT event_type, cents,
         2 * coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS mrx2
  FROM xg),
yg AS (SELECT event_type, hod, count(*) AS t FROM v GROUP BY 1, 2),
ymr AS (
  SELECT event_type, hod,
         2 * coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY hod
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS mry2
  FROM yg),
m AS (
  SELECT v.event_type, x.mrx2, y.mry2
  FROM v JOIN xmr x ON x.event_type = v.event_type AND x.cents = v.cents
         JOIN ymr y ON y.event_type = v.event_type AND y.hod = v.hod),
agg AS (
  SELECT event_type, count(*) AS n,
         sum(cast(mrx2 AS hugeint)) AS sx, sum(cast(mry2 AS hugeint)) AS sy,
         sum(cast(mrx2 AS hugeint) * mrx2) AS sxx,
         sum(cast(mry2 AS hugeint) * mry2) AS syy,
         sum(cast(mrx2 AS hugeint) * mry2) AS sxy
  FROM m GROUP BY 1)
SELECT event_type, cast(n AS bigint) AS n,
       round(cast(n * sxy - sx * sy AS double)
             / (sqrt(cast(n * sxx - sx * sx AS double))
                * sqrt(cast(n * syy - sy * sy AS double))), 6) AS rho
FROM agg ORDER BY event_type"""


@register(
    "spearman_value_hour",
    oracle=_spearman_oracle(),
    tags=("evaluation", "statistics", "scale-pattern"),
)
def spearman_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, rho): Spearman rank correlation between `value`
    and hour-of-day per event type — Pearson on DOUBLED midranks (exact
    integers under ties), decimal(38,0) cross-moments, the two variance
    factors rooted separately so nothing overflows (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    v = e.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hod"))

    # cents midranks: two-phase bucketed cumulation per type (stats10c).
    xg = (v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("t"))
          .withColumn("bucket", F.expr(f"cents div {_BUCKET}")))
    wb = (W.partitionBy("event_type", "bucket").orderBy("cents")
          .rowsBetween(W.unboundedPreceding, -1))
    local = xg.withColumn("lb", F.coalesce(F.sum("t").over(wb), F.lit(0)))
    btot = xg.groupBy("event_type", "bucket").agg(F.sum("t").alias("bt"))
    wo = (W.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(W.unboundedPreceding, -1))
    offs = (btot.withColumn(
        "off", F.coalesce(F.sum("bt").over(wo), F.lit(0)))
        .select("event_type", "bucket", "off"))
    xmr = (local.join(F.broadcast(offs), ["event_type", "bucket"])
           .select("event_type", "cents",
                   (2 * (F.col("lb") + F.col("off")) + F.col("t") + 1)
                   .alias("mrx2")))
    # hour-of-day midranks: 24 rows per type — one tiny window.
    yg = v.groupBy("event_type", "hod").agg(F.count(F.lit(1)).alias("t"))
    wy = (W.partitionBy("event_type").orderBy("hod")
          .rowsBetween(W.unboundedPreceding, -1))
    ymr = (yg.withColumn("lb", F.coalesce(F.sum("t").over(wy), F.lit(0)))
           .select("event_type", "hod",
                   (2 * F.col("lb") + F.col("t") + 1).alias("mry2")))

    # Cross-moments from the (cents, hod) CONTINGENCY, not the raw rows:
    # one combinable rollup of the corpus, then group-cardinality joins.
    ct = (v.groupBy("event_type", "cents", "hod")
          .agg(F.count(F.lit(1)).alias("w")))
    m = (ct.join(xmr, ["event_type", "cents"])
         .join(F.broadcast(ymr), ["event_type", "hod"]))
    w = F.col("w").cast(dec)
    agg = (m.groupBy("event_type")
           .agg(F.sum("w").cast("long").alias("n"),
                F.sum(w * F.col("mrx2")).alias("sx"),
                F.sum(w * F.col("mry2")).alias("sy"),
                F.sum(w * F.col("mrx2") * F.col("mrx2")).alias("sxx"),
                F.sum(w * F.col("mry2") * F.col("mry2")).alias("syy"),
                F.sum(w * F.col("mrx2") * F.col("mry2")).alias("sxy")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return (agg.select("event_type", F.col("n").cast("long").alias("n"),
                       F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
                       .alias("rho"))
            .orderBy("event_type"))


def _bf_oracle() -> str:
    return f"""
WITH v AS (
  SELECT event_type, cast(floor(value * 100) AS bigint) AS cents
  FROM events),
g AS (SELECT event_type, cents, count(*) AS t FROM v GROUP BY 1, 2),
cum AS (
  SELECT event_type, cents, t,
         coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
         sum(t) OVER (PARTITION BY event_type) AS n_h
  FROM g),
med AS (  -- doubled median: x_((n+1)//2) + x_((n+2)//2), exact integer
  SELECT event_type,
         sum(CASE WHEN (n_h + 1) // 2 > before
                   AND (n_h + 1) // 2 <= before + t THEN cents END)
       + sum(CASE WHEN (n_h + 2) // 2 > before
                   AND (n_h + 2) // 2 <= before + t THEN cents END)
           AS med2
  FROM cum GROUP BY 1),
z AS (
  SELECT v.event_type, abs(2 * v.cents - m.med2) AS z2
  FROM v JOIN med m ON m.event_type = v.event_type),
s AS (
  SELECT event_type, count(*) AS n_h,
         sum(z2) AS s_h, sum(cast(z2 AS hugeint) * z2) AS q_h
  FROM z GROUP BY 1),
t2 AS (
  SELECT cast(sum(n_h) AS bigint) AS n, cast(count(*) AS bigint) AS k,
         sum((cast(s_h AS hugeint) * s_h * {_SCALE}) // n_h) AS between_s,
         cast(sum(s_h) AS hugeint) AS s,
         cast(sum(q_h) AS hugeint) AS q
  FROM s),
u AS (
  SELECT n, k,
         cast(greatest(between_s - (s * s * {_SCALE}) // n, 0)
              AS double) AS ssb_s,
         cast(q * {_SCALE} - between_s AS double) AS ssw_s
  FROM t2)
SELECT n, k,
       round((ssb_s / (k - 1)) / (ssw_s / (n - k)), 6) AS f_bf
FROM u"""


@register(
    "brown_forsythe_variance",
    oracle=_bf_oracle(),
    tags=("evaluation", "statistics"),
)
def brown_forsythe_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, k, f_bf): Brown-Forsythe variance-homogeneity test of `value`
    across the five event types — each group centered at its DOUBLED
    median (exact integer for odd or even n), integer absolute
    deviations, ANOVA F on the stats10b fixed-point lattice (module
    docstring)."""
    e = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    v = e.select("event_type",
                 F.floor(F.col("value") * 100).cast("bigint").alias("cents"))
    g = v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("t"))
    wc = (W.partitionBy("event_type").orderBy("cents")
          .rowsBetween(W.unboundedPreceding, -1))
    wt = W.partitionBy("event_type")
    cum = (g.withColumn("before",
                        F.coalesce(F.sum("t").over(wc), F.lit(0)))
           .withColumn("n_h", F.sum("t").over(wt)))
    # positions (n+1)//2 and (n+2)//2 located inside the cumulated runs
    lo = F.floor((F.col("n_h") + 1) / 2).cast("long")
    hi = F.floor((F.col("n_h") + 2) / 2).cast("long")
    med = (cum.groupBy("event_type")
           .agg((F.sum(F.when((lo > F.col("before"))
                              & (lo <= F.col("before") + F.col("t")),
                              F.col("cents")))
                 + F.sum(F.when((hi > F.col("before"))
                                & (hi <= F.col("before") + F.col("t")),
                                F.col("cents")))).alias("med2")))
    z = (v.join(F.broadcast(med), "event_type")
         .select("event_type",
                 F.abs(2 * F.col("cents") - F.col("med2")).alias("z2")))
    s = (z.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n_h"),
              F.sum("z2").alias("s_h"),
              F.sum(F.col("z2").cast(dec) * F.col("z2")).alias("q_h")))

    def _floor_div_scaled(num, divisor):
        prod = num.cast(dec) * num * F.lit(_SCALE)
        return ((prod - prod % divisor) / divisor).cast(dec)

    t2 = s.agg(F.sum("n_h").cast("long").alias("n"),
               F.count(F.lit(1)).cast("long").alias("k"),
               F.sum(_floor_div_scaled(F.col("s_h"), F.col("n_h")))
               .cast(dec).alias("between_s"),
               F.sum("s_h").cast(dec).alias("s"),
               F.sum("q_h").cast(dec).alias("q"))
    u = t2.select(
        "n", "k",
        F.greatest(F.col("between_s")
                   - _floor_div_scaled(F.col("s"), F.col("n")),
                   F.lit(0).cast(dec)).cast("double").alias("ssb_s"),
        (F.col("q") * _SCALE - F.col("between_s"))
        .cast("double").alias("ssw_s"))
    return u.select(
        "n", "k",
        F.round((F.col("ssb_s") / (F.col("k") - 1))
                / (F.col("ssw_s") / (F.col("n") - F.col("k"))),
                6).alias("f_bf"))


def _ca_oracle() -> str:
    return """
WITH h AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS w,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r
  FROM events GROUP BY 1),
agg AS (
  SELECT cast(sum(n) AS bigint) AS nt, cast(sum(r) AS bigint) AS rt,
         cast(sum(w * n) AS bigint) AS swn,
         cast(sum(w * w * n) AS bigint) AS sw2n,
         cast(sum(w * (r * (SELECT sum(n) FROM h)
                       - n * (SELECT sum(r) FROM h))) AS hugeint) AS t_num
  FROM h)
SELECT nt AS n, rt AS r, cast(t_num AS bigint) AS t_stat,
       round(cast(t_num AS double)
             / sqrt(cast(cast(rt AS hugeint) * (nt - rt)
                         * (cast(nt AS hugeint) * sw2n - cast(swn AS hugeint)
                            * swn) AS double)
                    / cast(nt AS double)), 6) AS z_ca
FROM agg"""


@register(
    "cochran_armitage_trend",
    oracle=_ca_oracle(),
    tags=("evaluation", "statistics"),
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, r, t_stat, z_ca): Cochran-Armitage trend test of purchase
    proportion across hour-of-day scores 0..23 — T = sum w*(r_h*N -
    n_h*R) is an exact integer (N x the classical statistic), its
    variance R(N-R)*(N*sum(w^2 n) - (sum w n)^2)/N an exact rational,
    one sqrt (IEEE correctly rounded) and one division for z."""
    e = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    h = (e.groupBy(F.expr("(unix_micros(ts) div 3600000000) % 24")
                   .alias("w"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("r")))
    tot = h.agg(F.sum("n").alias("nt0"), F.sum("r").alias("rt0"))
    agg = (h.crossJoin(F.broadcast(tot))
           .agg(F.max("nt0").cast("long").alias("nt"),
                F.max("rt0").cast("long").alias("rt"),
                F.sum(F.col("w") * F.col("n")).cast("long").alias("swn"),
                F.sum(F.col("w") * F.col("w") * F.col("n"))
                .cast("long").alias("sw2n"),
                F.sum(F.col("w").cast(dec)
                      * (F.col("r") * F.col("nt0")
                         - F.col("n") * F.col("rt0"))).alias("t_num")))
    # t_num = N*T, so Var(t_num) = N^2 * Var(T)
    #        = R(N-R) * (N*sum(w^2 n) - (sum w n)^2) / N.
    var = (F.col("rt").cast(dec) * (F.col("nt") - F.col("rt"))
           * (F.col("nt").cast(dec) * F.col("sw2n")
              - F.col("swn").cast(dec) * F.col("swn"))).cast("double") \
        / F.col("nt").cast("double")
    return agg.select(
        F.col("nt").alias("n"), F.col("rt").alias("r"),
        F.col("t_num").cast("long").alias("t_stat"),
        F.round(F.col("t_num").cast("double") / F.sqrt(var), 6)
        .alias("z_ca"))


_HALF_CUT = "2024-01-16"
# "Engaged purchaser" = at least _THR purchases in the half-month; the
# raw any-purchase indicator saturates on this corpus (~13 purchases per
# user-month: b = c = 0 at every SF), so the paired test rides the
# engagement threshold instead — measured healthy flip counts at
# sf0.001/0.01/0.1 (b, c = 5/4, 38/41, 378/388).
_THR = 7


def _mcnemar_oracle() -> str:
    return f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                   AND ts < TIMESTAMP '{_HALF_CUT}' THEN 1 ELSE 0 END)
              >= {_THR} THEN 1 ELSE 0 END AS a1,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                   AND ts >= TIMESTAMP '{_HALF_CUT}' THEN 1 ELSE 0 END)
              >= {_THR} THEN 1 ELSE 0 END AS a2
  FROM events GROUP BY 1),
f AS (
  SELECT cast(count(*) AS bigint) AS n_users,
         cast(sum(CASE WHEN a1 = 1 AND a2 = 0 THEN 1 ELSE 0 END)
              AS bigint) AS b,
         cast(sum(CASE WHEN a1 = 0 AND a2 = 1 THEN 1 ELSE 0 END)
              AS bigint) AS c
  FROM u)
SELECT n_users, b, c,
       round(CASE WHEN b + c = 0 THEN 0.0
                  ELSE cast((abs(b - c) - 1) * (abs(b - c) - 1) AS double)
                       / (b + c) END, 6) AS chi2_cc
FROM f"""


@register(
    "mcnemar_purchase_halves",
    oracle=_mcnemar_oracle(),
    tags=("evaluation", "statistics", "experiment"),
)
def mcnemar_purchase_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_users, b, c, chi2_cc): McNemar's paired test of per-user
    ENGAGED-purchaser status (>= _THR purchases) between the two halves
    of the month — b = users engaged early but not late, c = the
    reverse; the continuity-corrected statistic is pure counting plus
    one division (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    cut = F.lit(_HALF_CUT).cast("timestamp")
    u = (e.groupBy("user_id")
         .agg((F.sum(F.when((F.col("event_type") == "purchase")
                            & (F.col("ts") < cut), 1).otherwise(0))
               >= _THR).cast("int").alias("a1"),
              (F.sum(F.when((F.col("event_type") == "purchase")
                            & (F.col("ts") >= cut), 1).otherwise(0))
               >= _THR).cast("int").alias("a2")))
    f = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when((F.col("a1") == 1) & (F.col("a2") == 0), 1)
              .otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("a1") == 0) & (F.col("a2") == 1), 1)
              .otherwise(0)).cast("long").alias("c"))
    d = F.abs(F.col("b") - F.col("c"))
    return f.select(
        "n_users", "b", "c",
        F.round(F.when(F.col("b") + F.col("c") == 0, 0.0)
                .otherwise(((d - 1) * (d - 1)).cast("double")
                           / (F.col("b") + F.col("c"))), 6)
        .alias("chi2_cc"))
