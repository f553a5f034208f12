"""Round-15 statistics: Welch's unequal-variance t-test, a lag-1
Granger-style predictability F-test, the partial autocorrelation
function via Durbin-Levinson, and the Hodges-Lehmann shift estimator on
the quantity lattice.

Why these: they complete the inference tier around what's already
registered — Welch's t is THE two-sample mean test the repo only had
rank-based substitutes for (Mann-Whitney AUC, Kruskal-Wallis); the
Granger F closes the lead-lag story timeseries10's cross-correlation
opens (is the lead PREDICTIVE beyond autocorrelation?); PACF is the
standard companion readout to acf_hourly_lags (AR-order fingerprint);
Hodges-Lehmann is the robust location-shift partner to the rank tests,
exact here because l_quantity lives on a 50-value lattice.

Exactness:
- Welch: cents sums ride bigint / DECIMAL(38,0) (order-free, exact);
  the t/df formulas are evaluated with the SAME double expression tree
  in both engines (+-*/ and one IEEE-exact sqrt), rounded at 6.
- Granger: all ten sufficient sums over the dense (t-1, t) hour-pair
  grid are exact bigints; the centered normal-equation solve is closed
  form (2x2 determinant), doubles only at the end.
- PACF: the five autocorrelation ratios reuse acf_hourly_lags' exact
  N-scaled integer moments; the Durbin-Levinson recursion unrolls to
  the same literal expression tree in both engines (pure +-*/).
- Hodges-Lehmann: the pairwise-difference distribution is computed on
  the 50x50 value-histogram grid (counts products, never row pairs);
  order statistics come from cumulative sums over the bounded
  difference lattice via self-join — fully integer.

Scale stance (100 TB): each query is one (or two) map-side-combinable
corpus reductions to a bounded grid — value lattice, hour spine, or a
1-row sufficient-statistics frame; pair work is lattice x lattice,
never corpus x corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# ---------------------------------------------------------------- Welch

_WELCH_ORACLE = """
WITH x AS (SELECT CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END
                    AS wk,
                  cast(round(o_totalprice * 100) AS bigint) AS xc
           FROM orders),
s AS (SELECT wk, cast(count(*) AS bigint) AS n,
             cast(sum(xc) AS bigint) AS sx,
             cast(sum(cast(xc AS decimal(19, 0)) * xc) AS decimal(38, 0))
               AS sxx
      FROM x GROUP BY wk),
w AS (SELECT max(CASE WHEN wk = 1 THEN n END) AS n1,
             max(CASE WHEN wk = 0 THEN n END) AS n2,
             max(CASE WHEN wk = 1 THEN sx END) AS sx1,
             max(CASE WHEN wk = 0 THEN sx END) AS sx2,
             max(CASE WHEN wk = 1 THEN sxx END) AS sxx1,
             max(CASE WHEN wk = 0 THEN sxx END) AS sxx2
      FROM s),
m AS (SELECT n1, n2,
             cast(sx1 AS double) / n1 / 100.0 AS m1,
             cast(sx2 AS double) / n2 / 100.0 AS m2,
             (cast(sxx1 AS double)
              - cast(sx1 AS double) * sx1 / n1) / (n1 - 1) / 10000.0
               AS v1,
             (cast(sxx2 AS double)
              - cast(sx2 AS double) * sx2 / n2) / (n2 - 1) / 10000.0
               AS v2
      FROM w)
SELECT n1 AS n_weekend, n2 AS n_weekday,
       round(m1, 6) AS mean_weekend, round(m2, 6) AS mean_weekday,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df
FROM m"""


@register(
    "welch_ttest_value",
    oracle=_WELCH_ORACLE,
    tags=("statistics", "hypothesis-test"),
)
def welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of weekend vs weekday order value
    (cents-lattice sufficient statistics, Satterthwaite df)."""
    o = load_table(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.weekday("o_orderdate") >= 5, 1).otherwise(0).alias("wk"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("xc"))
    s = x.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xc").cast("long").alias("sx"),
        F.sum(F.col("xc").cast("decimal(19,0)") * F.col("xc"))
        .cast("decimal(38,0)").alias("sxx"))
    w = s.agg(
        F.max(F.when(F.col("wk") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("wk") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("wk") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("wk") == 0, F.col("sx"))).alias("sx2"),
        F.max(F.when(F.col("wk") == 1, F.col("sxx"))).alias("sxx1"),
        F.max(F.when(F.col("wk") == 0, F.col("sxx"))).alias("sxx2"))
    m = w.select(
        "n1", "n2",
        (F.col("sx1").cast("double") / F.col("n1") / 100.0).alias("m1"),
        (F.col("sx2").cast("double") / F.col("n2") / 100.0).alias("m2"),
        ((F.col("sxx1").cast("double")
          - F.col("sx1").cast("double") * F.col("sx1") / F.col("n1"))
         / (F.col("n1") - 1) / 10000.0).alias("v1"),
        ((F.col("sxx2").cast("double")
          - F.col("sx2").cast("double") * F.col("sx2") / F.col("n2"))
         / (F.col("n2") - 1) / 10000.0).alias("v2"))
    se1, se2 = F.col("v1") / F.col("n1"), F.col("v2") / F.col("n2")
    return m.select(
        F.col("n1").alias("n_weekend"), F.col("n2").alias("n_weekday"),
        F.round("m1", 6).alias("mean_weekend"),
        F.round("m2", 6).alias("mean_weekday"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 6)
        .alias("t_stat"),
        F.round((se1 + se2) * (se1 + se2)
                / (se1 * se1 / (F.col("n1") - 1)
                   + se2 * se2 / (F.col("n2") - 1)), 6).alias("df"))


# -------------------------------------------------------------- Granger

_GX, _GY = "view", "purchase"

_GRANGER_ORACLE = f"""
WITH h AS (
  SELECT cast(floor(epoch(ts) / 3600) AS bigint) AS hr,
         count(*) FILTER (WHERE event_type = '{_GX}') AS x,
         count(*) FILTER (WHERE event_type = '{_GY}') AS y
  FROM events WHERE event_type IN ('{_GX}', '{_GY}') GROUP BY 1),
b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
spine AS (SELECT g.hr FROM b, lateral (
            SELECT unnest(generate_series(b.lo, b.hi)) AS hr) g),
d AS (SELECT s.hr, coalesce(h.x, 0) AS x, coalesce(h.y, 0) AS y
      FROM spine s LEFT JOIN h USING (hr)),
pr AS (SELECT cur.y AS yv, prv.y AS a, prv.x AS bb
       FROM d cur JOIN d prv ON prv.hr = cur.hr - 1),
s AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(a) AS bigint) AS sa, cast(sum(bb) AS bigint) AS sb,
             cast(sum(yv) AS bigint) AS sy,
             cast(sum(a * a) AS bigint) AS saa,
             cast(sum(bb * bb) AS bigint) AS sbb,
             cast(sum(a * bb) AS bigint) AS sab,
             cast(sum(a * yv) AS bigint) AS say,
             cast(sum(bb * yv) AS bigint) AS sby,
             cast(sum(yv * yv) AS bigint) AS syy
      FROM pr),
c AS (SELECT n,
             cast(n * saa - sa * sa AS double) AS caa,
             cast(n * sbb - sb * sb AS double) AS cbb,
             cast(n * sab - sa * sb AS double) AS cab,
             cast(n * say - sa * sy AS double) AS cay,
             cast(n * sby - sb * sy AS double) AS cby,
             cast(n * syy - sy * sy AS double) AS cyy
      FROM s),
f AS (SELECT n, cay / caa AS b_r,
             (cay * cbb - cby * cab) / (caa * cbb - cab * cab) AS b1,
             (cby * caa - cay * cab) / (caa * cbb - cab * cab) AS b2,
             cyy - (cay / caa) * cay AS rss_r_scaled,
             cyy - ((cay * cbb - cby * cab) / (caa * cbb - cab * cab)) * cay
                 - ((cby * caa - cay * cab) / (caa * cbb - cab * cab)) * cby
               AS rss_u_scaled
      FROM c)
SELECT n, round(b1, 6) AS beta_ylag, round(b2, 6) AS beta_xlag,
       round((rss_r_scaled - rss_u_scaled)
             / (rss_u_scaled / (n - 3)), 6) AS f_stat
FROM f"""


@register(
    "granger_lag1_hourly",
    oracle=_GRANGER_ORACLE,
    tags=("statistics", "timeseries", "causality"),
)
def granger_lag1_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger predictability test: does the previous hour's VIEW
    count predict this hour's PURCHASE count beyond the purchase series'
    own lag? F = ((RSS_r - RSS_u)/1) / (RSS_u/(n-3)) from the exact
    centered sufficient sums (restricted: y~y_lag; unrestricted:
    y~y_lag+x_lag), dense zero-filled hour spine."""
    e = load_table(spark, sf_dir, "events")
    h = (e.filter(F.col("event_type").isin(_GX, _GY))
         .select(F.floor(F.unix_timestamp("ts") / 3600).cast("long")
                 .alias("hr"), "event_type")
         .groupBy("hr")
         .agg(F.count(F.when(F.col("event_type") == _GX, 1)).alias("x"),
              F.count(F.when(F.col("event_type") == _GY, 1)).alias("y")))
    spine = (h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
             .select(F.explode(F.sequence("lo", "hi")).alias("hr")))
    d = (spine.join(h, "hr", "left")
         .select("hr", F.coalesce("x", F.lit(0)).alias("x"),
                 F.coalesce("y", F.lit(0)).alias("y")))
    cur = d.select(F.col("hr").alias("hc"), F.col("y").alias("yv"))
    prv = d.select((F.col("hr") + 1).alias("hc"), F.col("y").alias("a"),
                   F.col("x").alias("bb"))
    pr = cur.join(prv, "hc")
    s = pr.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("bb").cast("long").alias("sb"),
        F.sum("yv").cast("long").alias("sy"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("bb") * F.col("bb")).cast("long").alias("sbb"),
        F.sum(F.col("a") * F.col("bb")).cast("long").alias("sab"),
        F.sum(F.col("a") * F.col("yv")).cast("long").alias("say"),
        F.sum(F.col("bb") * F.col("yv")).cast("long").alias("sby"),
        F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syy"))
    c = s.select(
        "n",
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
        .cast("double").alias("caa"),
        (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
        .cast("double").alias("cbb"),
        (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
        .cast("double").alias("cab"),
        (F.col("n") * F.col("say") - F.col("sa") * F.col("sy"))
        .cast("double").alias("cay"),
        (F.col("n") * F.col("sby") - F.col("sb") * F.col("sy"))
        .cast("double").alias("cby"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double").alias("cyy"))
    det = F.col("caa") * F.col("cbb") - F.col("cab") * F.col("cab")
    b1 = (F.col("cay") * F.col("cbb") - F.col("cby") * F.col("cab")) / det
    b2 = (F.col("cby") * F.col("caa") - F.col("cay") * F.col("cab")) / det
    rss_r = F.col("cyy") - (F.col("cay") / F.col("caa")) * F.col("cay")
    rss_u = F.col("cyy") - b1 * F.col("cay") - b2 * F.col("cby")
    return c.select(
        "n", F.round(b1, 6).alias("beta_ylag"),
        F.round(b2, 6).alias("beta_xlag"),
        F.round((rss_r - rss_u) / (rss_u / (F.col("n") - 3)), 6)
        .alias("f_stat"))


# ----------------------------------------------------------------- PACF

_PACF_LAGS = 5

# Durbin-Levinson unroll shared between both engines: one text, two
# dialects only in how r1..r5 are produced.
_DL_SQL = """
p1 AS (SELECT r1, r2, r3, r4, r5, r1 AS f11 FROM r),
p2 AS (SELECT *, (r2 - f11 * r1) / (1 - f11 * r1) AS f22 FROM p1),
p2b AS (SELECT *, f11 - f22 * f11 AS f21 FROM p2),
p3 AS (SELECT *, (r3 - (f21 * r2 + f22 * r1))
                 / (1 - (f21 * r1 + f22 * r2)) AS f33 FROM p2b),
p3b AS (SELECT *, f21 - f33 * f22 AS f31, f22 - f33 * f21 AS f32
        FROM p3),
p4 AS (SELECT *, (r4 - (f31 * r3 + f32 * r2 + f33 * r1))
                 / (1 - (f31 * r1 + f32 * r2 + f33 * r3)) AS f44
       FROM p3b),
p4b AS (SELECT *, f31 - f44 * f33 AS f41, f32 - f44 * f32 AS f42,
                  f33 - f44 * f31 AS f43
        FROM p4),
p5 AS (SELECT *, (r5 - (f41 * r4 + f42 * r3 + f43 * r2 + f44 * r1))
                 / (1 - (f41 * r1 + f42 * r2 + f43 * r3 + f44 * r4))
                   AS f55
       FROM p4b)"""

_PACF_ORACLE = f"""
WITH h AS (
  SELECT cast(floor(epoch(ts) / 3600) AS bigint) AS hr, count(*) AS c
  FROM events GROUP BY 1),
b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
spine AS (SELECT g.hr FROM b, lateral (
            SELECT unnest(generate_series(b.lo, b.hi)) AS hr) g),
d AS (SELECT s.hr, coalesce(h.c, 0) AS c FROM spine s LEFT JOIN h
      USING (hr)),
t AS (SELECT cast(count(*) AS bigint) AS n, cast(sum(c) AS bigint) AS s
      FROM d),
den AS (SELECT sum((t.n * d.c - t.s) * (t.n * d.c - t.s)) AS dvar
        FROM d, t),
lags AS (SELECT unnest(generate_series(1, {_PACF_LAGS})) AS lag),
pairs AS (
  SELECT l.lag, sum((t.n * a.c - t.s) * (t.n * b.c - t.s)) AS numer
  FROM lags l JOIN d a ON TRUE JOIN d b ON b.hr = a.hr + l.lag
  CROSS JOIN t GROUP BY l.lag),
r AS (SELECT
        max(CASE WHEN lag = 1 THEN cast(numer AS double) END) / max(dvar)
          AS r1,
        max(CASE WHEN lag = 2 THEN cast(numer AS double) END) / max(dvar)
          AS r2,
        max(CASE WHEN lag = 3 THEN cast(numer AS double) END) / max(dvar)
          AS r3,
        max(CASE WHEN lag = 4 THEN cast(numer AS double) END) / max(dvar)
          AS r4,
        max(CASE WHEN lag = 5 THEN cast(numer AS double) END) / max(dvar)
          AS r5
      FROM pairs, (SELECT cast(dvar AS double) AS dvar FROM den)),
{_DL_SQL}
SELECT lag, round(pacf, 6) AS pacf FROM (
  SELECT 1 AS lag, f11 AS pacf FROM p5
  UNION ALL SELECT 2, f22 FROM p5
  UNION ALL SELECT 3, f33 FROM p5
  UNION ALL SELECT 4, f44 FROM p5
  UNION ALL SELECT 5, f55 FROM p5)
ORDER BY lag"""


@register(
    "pacf_durbin_levinson",
    oracle=_PACF_ORACLE,
    tags=("statistics", "timeseries"),
)
def pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the dense hourly event-count series at
    lags 1..5 via the Durbin-Levinson recursion, applied to the SAME
    exact-integer boundary-pair autocorrelation estimates
    acf_hourly_lags reports (document: PACF is defined here ON those
    estimates; the recursion itself is pure +-*/ and unrolls to an
    identical expression tree in both engines)."""
    e = load_table(spark, sf_dir, "events")
    # Checkpointed: h is referenced by BOTH the spine bounds and the
    # dense left join, and the downstream autocorrelation build
    # multiplies those references (dt x3 via probe/pair/denominator) —
    # together with the stack() pivot below this takes the plan from 60
    # events scans (r15 scan audit) to ONE. Hours-cardinality frame.
    h = (e.select(F.floor(F.unix_timestamp("ts") / 3600).cast("long")
                  .alias("hr"))
         .groupBy("hr").agg(F.count(F.lit(1)).alias("c"))
         ).localCheckpoint(eager=True)
    spine = (h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
             .select(F.explode(F.sequence("lo", "hi")).alias("hr")))
    d = (spine.join(h, "hr", "left")
         .select("hr", F.coalesce("c", F.lit(0)).alias("c")))
    t = d.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("c").cast("long").alias("s"))
    dt = (d.crossJoin(F.broadcast(t))
          .select("hr", (F.col("n") * F.col("c") - F.col("s")).alias("z")))
    den = dt.agg(F.sum(F.col("z") * F.col("z")).alias("dvar"))
    probe = (dt.select("hr", F.col("z").alias("za"))
             .withColumn("lag", F.explode(F.array(
                 *[F.lit(k) for k in range(1, _PACF_LAGS + 1)])))
             .withColumn("hr_b", F.col("hr") + F.col("lag")))
    pairs = (probe.join(dt.select(F.col("hr").alias("hr_b"),
                                  F.col("z").alias("zb")), "hr_b")
             .groupBy("lag").agg(F.sum(F.col("za") * F.col("zb"))
                                 .alias("numer")))
    r = (pairs.crossJoin(F.broadcast(den))
         .agg(*[(F.max(F.when(F.col("lag") == k,
                              F.col("numer").cast("double")))
                 / F.max(F.col("dvar").cast("double"))).alias(f"r{k}")
                for k in range(1, _PACF_LAGS + 1)]))
    r.createOrReplaceTempView("pacf15_r")
    # stack() instead of the oracle's 5-way UNION over p5: each UNION
    # branch re-referenced the 1-row recursion frame and Catalyst
    # re-evaluated the WHOLE upstream build per branch (x5 — the larger
    # half of this plan's 60x events re-scan, r15 scan audit); stack
    # pivots the same five (lag, pacf) rows out of ONE p5 evaluation.
    # Identical values and types; the oracle keeps its UNION (DuckDB
    # CTEs are shared, so only the Spark side paid the multiplier).
    out = spark.sql(f"""
        WITH r AS (SELECT * FROM pacf15_r),
        {_DL_SQL.lstrip()}
        SELECT lag, round(pacf, 6) AS pacf FROM (
          SELECT stack(5, 1, f11, 2, f22, 3, f33, 4, f44, 5, f55)
                 AS (lag, pacf) FROM p5)
        ORDER BY lag""")
    return out


# ------------------------------------------------------ Hodges-Lehmann

_HL_ORACLE = """
WITH q AS (SELECT cast(l_quantity AS bigint) AS qv, l_returnflag AS fl
           FROM lineitem WHERE l_returnflag IN ('R', 'N')),
ha AS (SELECT qv, cast(count(*) AS bigint) AS ca FROM q
       WHERE fl = 'R' GROUP BY qv),
hb AS (SELECT qv, cast(count(*) AS bigint) AS cb FROM q
       WHERE fl = 'N' GROUP BY qv),
diff AS (SELECT ha.qv - hb.qv AS dv, sum(ha.ca * hb.cb) AS wt
         FROM ha JOIN hb ON TRUE GROUP BY dv),
tot AS (SELECT sum(wt) AS t FROM diff),
cum AS (SELECT a.dv, sum(b.wt) AS cw
        FROM diff a JOIN diff b ON b.dv <= a.dv GROUP BY a.dv),
ranks AS (SELECT (t + 1) // 2 AS r_lo, t // 2 + 1 AS r_hi FROM tot),
lo AS (SELECT min(dv) AS d_lo FROM cum, ranks WHERE cw >= r_lo),
hi AS (SELECT min(dv) AS d_hi FROM cum, ranks WHERE cw >= r_hi)
SELECT cast((SELECT sum(ca) FROM ha) AS bigint) AS n_r,
       cast((SELECT sum(cb) FROM hb) AS bigint) AS n_n,
       cast(d_lo AS bigint) AS d_lo, cast(d_hi AS bigint) AS d_hi,
       round((d_lo + d_hi) / 2.0, 1) AS hl_shift
FROM lo, hi"""


@register(
    "hodges_lehmann_quantity_shift",
    oracle=_HL_ORACLE,
    tags=("statistics", "robust", "lattice"),
)
def hodges_lehmann_quantity_shift(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location-shift estimate between returned ('R')
    and non-returned ('N') line quantities: the exact median of ALL
    n_R x n_N pairwise differences, computed on the 50x50
    value-histogram grid with counts-product weights — order statistics
    by cumulative weight over the ~99-value difference lattice."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag").isin("R", "N"))
          .select(F.col("l_quantity").cast("long").alias("qv"),
                  F.col("l_returnflag").alias("fl")))
    # r16 scan-audit collapse (guide §2.4 / r10 multi-branch lesson): the
    # two histograms fed diff, the rank cumulation's self-join, and the
    # n_r/n_n scalars — 14 lineitem scans in one plan. ONE scan builds
    # the (flag, quantity) histogram (<= 2 x 50 rows), eagerly
    # checkpointed; every branch reads the RDD (14 scans -> 1).
    h2 = (li.groupBy("fl", "qv")
          .agg(F.count(F.lit(1)).cast("long").alias("c"))
          .localCheckpoint(eager=True))
    ha = (h2.filter(F.col("fl") == "R")
          .select("qv", F.col("c").alias("ca")))
    hb = (h2.filter(F.col("fl") == "N")
          .select("qv", F.col("c").alias("cb")))
    diff = (ha.crossJoin(hb.select(F.col("qv").alias("qb"), "cb"))
            .groupBy((F.col("qv") - F.col("qb")).alias("dv"))
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("wt")))
    tot = diff.agg(F.sum("wt").alias("t"))
    cum = (diff.alias("a")
           .join(F.broadcast(diff.alias("b")),
                 F.col("b.dv") <= F.col("a.dv"))
           .groupBy(F.col("a.dv").alias("dv"))
           .agg(F.sum("b.wt").alias("cw")))
    ranks = tot.select(((F.col("t") + 1) / 2).cast("long").alias("r_lo"),
                       (F.col("t") / 2 + 1).cast("long").alias("r_hi"))
    wr = cum.crossJoin(F.broadcast(ranks))
    lo = (wr.filter(F.col("cw") >= F.col("r_lo"))
          .agg(F.min("dv").alias("d_lo")))
    hi = (wr.filter(F.col("cw") >= F.col("r_hi"))
          .agg(F.min("dv").alias("d_hi")))
    na = ha.agg(F.sum("ca").cast("long").alias("n_r"))
    nb = hb.agg(F.sum("cb").cast("long").alias("n_n"))
    return (na.crossJoin(nb).crossJoin(lo).crossJoin(hi)
            .select("n_r", "n_n",
                    F.col("d_lo").cast("long").alias("d_lo"),
                    F.col("d_hi").cast("long").alias("d_hi"),
                    F.round((F.col("d_lo") + F.col("d_hi")) / 2.0, 1)
                    .alias("hl_shift")))
