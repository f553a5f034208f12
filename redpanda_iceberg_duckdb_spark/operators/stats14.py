"""Round-14 statistics batch: Ljung-Box portmanteau, Page-Hinkley drift
detection, the Friedman blocked rank test, and the two-sample
Anderson-Darling statistic — the remaining classical monitoring tests
beside the repo's ACF, KS/CvM, Kruskal-Wallis, and runs-test tier.

Exactness discipline (shared across the module):
- Hourly series ride the dense integer spine and N-SCALED deviation
  lattice of timeseries10 (z_t = n*y_t - S is an exact bigint).
- Multi-term float sums are forbidden: every per-lag / per-value float
  term is SNAPPED to a fixed 1e-9 lattice with round() (half-away in
  both engines) and then summed as integers, so summation order cannot
  differ cross-engine. Int64 -> double casts stay below 2^53 at any SF
  this repo benches (bounds noted inline).
- Ranks use DOUBLED midranks (stats10c's Kruskal-Wallis idiom) so ties
  stay integral.

Scale stance (100 TB): every test reduces the corpus with one map-side-
combinable aggregate (per-hour, per-(day,type), or per-distinct-cents),
then works on the bounded reduction (hour grid / day x type cells /
value lattice). The only global windows are over those bounded frames
(the runs_test_hourly allowance class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .timeseries10 import _dense_hourly, _hourly_spine_sql

_LB_MAXLAG = 8

_LB_ORACLE = f"""
WITH {_hourly_spine_sql()},
t AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(c) AS bigint) AS s FROM d),
z AS (SELECT d.hr, t.n * d.c - t.s AS z FROM d, t),
den AS (SELECT sum(z * z) AS dvar FROM z),
lags AS (SELECT unnest(generate_series(1, {_LB_MAXLAG})) AS lag),
nums AS (
  SELECT l.lag, sum(a.z * b.z) AS numer
  FROM lags l JOIN z a ON TRUE JOIN z b ON b.hr = a.hr + l.lag
  GROUP BY l.lag),
terms AS (
  SELECT cast(round(1e9 * (cast(numer AS double) / den.dvar)
                        * (cast(numer AS double) / den.dvar)
                        / (t.n - lag)) AS bigint) AS t9
  FROM nums, den, t)
SELECT t.n AS n_hours, cast({_LB_MAXLAG} AS bigint) AS m_lags,
       cast({_LB_MAXLAG} AS bigint) AS df,
       round(t.n * (t.n + 2) * cast((SELECT sum(t9) FROM terms) AS double)
             / 1e9, 6) AS q_stat
FROM t"""


@register(
    "ljung_box_hourly",
    oracle=_LB_ORACLE,
    tags=("timeseries", "statistics", "scale-pattern"),
)
def ljung_box_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over lags 1..8 of the dense hourly event-count series:
    Q = n(n+2) sum rho_k^2/(n-k). Each lag's rho^2/(n-k) term is snapped
    to the 1e-9 lattice before the integer sum (module docstring); the
    autocorrelation numerators/denominator are the exact N-scaled bigint
    moments of acf_hourly_lags."""
    # r16 scan-audit collapse (guide §2.4 / r10 multi-branch lesson): the
    # dense hourly frame fed every downstream branch separately — one
    # eager checkpoint of the O(hours) frame makes the rest parquet-free
    # (the acf_hourly_lags fix, same family: 14x/8x events scans -> 2).
    d = _dense_hourly(spark, sf_dir, F.lit(True)).localCheckpoint(
        eager=True)
    t = d.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("c").cast("long").alias("s"))
    z = (d.crossJoin(F.broadcast(t))
         .select("hr", "n",
                 (F.col("n") * F.col("c") - F.col("s")).alias("z")))
    den = z.agg(F.sum(F.col("z") * F.col("z")).alias("dvar"))
    probe = (z.select("hr", F.col("z").alias("za"))
             .withColumn("lag", F.explode(F.array(
                 *[F.lit(k) for k in range(1, _LB_MAXLAG + 1)])))
             .withColumn("hr_b", F.col("hr") + F.col("lag")))
    nums = (probe.join(z.select(F.col("hr").alias("hr_b"),
                                F.col("z").alias("zb")), "hr_b")
            .groupBy("lag").agg(F.sum(F.col("za") * F.col("zb"))
                                .alias("numer")))
    # numer/dvar stay below 2^53 at bench SFs (z ~ 1e5, 1e3 hours ->
    # dvar ~ 1e13), so the int64 -> double casts are exact.
    rho = F.col("numer").cast("double") / F.col("dvar")
    terms = (nums.crossJoin(F.broadcast(den)).crossJoin(F.broadcast(t))
             .select(F.round(F.lit(1e9) * rho * rho
                             / (F.col("n") - F.col("lag")))
                     .cast("long").alias("t9")))
    tsum = terms.agg(F.sum("t9").alias("t9s"))
    return (t.crossJoin(F.broadcast(tsum))
            .select(F.col("n").alias("n_hours"),
                    F.lit(_LB_MAXLAG).cast("long").alias("m_lags"),
                    F.lit(_LB_MAXLAG).cast("long").alias("df"),
                    F.round(F.col("n") * (F.col("n") + 2)
                            * F.col("t9s").cast("double") / 1e9, 6)
                    .alias("q_stat")))


_PH_ORACLE = f"""
WITH {_hourly_spine_sql()},
t AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(c) AS bigint) AS s FROM d),
z AS (SELECT d.hr, t.n * d.c - t.s AS z FROM d, t),
cum1 AS (SELECT hr, sum(z) OVER (ORDER BY hr) AS m FROM z),
cum AS (SELECT hr, m,
               min(m) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS mmin
        FROM cum1),
ph AS (SELECT hr, m - mmin AS gap FROM cum)
SELECT (SELECT n FROM t) AS n_hours,
       cast(max(gap) AS bigint) AS ph_scaled,
       cast(min(CASE WHEN gap = (SELECT max(gap) FROM ph) THEN hr END)
            AS bigint) AS alarm_hr,
       round(cast(max(gap) AS double) / (SELECT n FROM t), 6) AS ph_value
FROM ph"""


@register(
    "page_hinkley_hourly",
    oracle=_PH_ORACLE,
    tags=("timeseries", "drift", "statistics"),
)
def page_hinkley_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-shift detector over the dense hourly series
    (delta = 0): PH = max_t (m_t - min_{i<=t} m_i) with m the cumulative
    N-scaled deviation — exact bigints end to end, one final unscaling
    division. Returns the sup, its first hour, and the unscaled value.
    The cumulative windows run over the hour grid (time-range-bounded,
    the runs_test allowance class)."""
    # r16 scan-audit collapse (guide §2.4 / r10 multi-branch lesson): the
    # dense hourly frame fed every downstream branch separately — one
    # eager checkpoint of the O(hours) frame makes the rest parquet-free
    # (the acf_hourly_lags fix, same family: 14x/8x events scans -> 2).
    d = _dense_hourly(spark, sf_dir, F.lit(True)).localCheckpoint(
        eager=True)
    t = d.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("c").cast("long").alias("s"))
    z = (d.crossJoin(F.broadcast(t))
         .select("hr", "n", (F.col("n") * F.col("c") - F.col("s"))
                 .alias("z")))
    w = W.orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = z.select("hr", "n", F.sum("z").over(w).alias("m"))
    cum = cum.select("hr", "n", "m", F.min("m").over(w).alias("mmin"))
    ph = cum.select("hr", "n", (F.col("m") - F.col("mmin")).alias("gap"))
    mx = ph.agg(F.max("gap").alias("mg"))
    return (ph.crossJoin(F.broadcast(mx))
            .agg(F.max("n").alias("n_hours"),
                 F.max("gap").cast("long").alias("ph_scaled"),
                 F.min(F.when(F.col("gap") == F.col("mg"), F.col("hr")))
                 .cast("long").alias("alarm_hr"),
                 F.round(F.max("gap").cast("double") / F.max("n"), 6)
                 .alias("ph_value")))


_FRIEDMAN_ORACLE = """
WITH cells_raw AS (
  SELECT cast(date_trunc('day', ts) AS date) AS day, event_type,
         count(*) AS c
  FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM cells_raw),
types AS (SELECT DISTINCT event_type FROM cells_raw),
cells AS (
  SELECT d.day, t.event_type, coalesce(r.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN cells_raw r ON r.day = d.day AND r.event_type = t.event_type),
dr AS (
  SELECT a.day, a.event_type,
         2 * sum(CASE WHEN b.c < a.c THEN 1 ELSE 0 END)
           + sum(CASE WHEN b.c = a.c THEN 1 ELSE 0 END) + 1 AS drank
  FROM cells a JOIN cells b ON b.day = a.day
  GROUP BY a.day, a.event_type, a.c),
rsum AS (SELECT event_type, cast(sum(drank) AS bigint) AS r2
         FROM dr GROUP BY event_type),
dims AS (SELECT cast((SELECT count(*) FROM days) AS bigint) AS b,
                cast((SELECT count(*) FROM types) AS bigint) AS k)
SELECT dims.b AS b_days, dims.k AS k_types, dims.k - 1 AS df,
       round(3.0 * (SELECT sum(r2 * r2) FROM rsum)
             / (dims.b * dims.k * (dims.k + 1))
             - 3.0 * dims.b * (dims.k + 1), 6) AS chi2_f
FROM dims"""


@register(
    "friedman_test_type_day",
    oracle=_FRIEDMAN_ORACLE,
    tags=("statistics", "experiment"),
)
def friedman_test_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi-square across event types (treatments) blocked by
    calendar day: within each day the k type-counts get DOUBLED midranks
    (exact under ties; zero-filled cells so every block ranks all k),
    chi2_F = 3*sum(R2_j^2)/(b k (k+1)) - 3 b (k+1) on the doubled-rank
    lattice where R2_j = 2*R_j (the 12/4 and 2^2 fold into 3). One
    bounded self-join per day (k^2 rows per block)."""
    e = load_table(spark, sf_dir, "events")
    raw = (e.select(F.to_date(F.date_trunc("day", "ts")).alias("day"),
                    "event_type")
           .groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("c")))
    days = raw.select("day").distinct()
    types = raw.select("event_type").distinct()
    cells = (days.crossJoin(F.broadcast(types))
             .join(raw, ["day", "event_type"], "left")
             .select("day", "event_type",
                     F.coalesce("c", F.lit(0)).alias("c")))
    b_side = cells.select(F.col("day").alias("day"),
                          F.col("c").alias("cb"))
    dr = (cells.join(b_side, "day")
          .groupBy("day", "event_type", "c")
          .agg((2 * F.sum(F.when(F.col("cb") < F.col("c"), 1).otherwise(0))
                + F.sum(F.when(F.col("cb") == F.col("c"), 1).otherwise(0))
                + 1).alias("drank")))
    rsum = dr.groupBy("event_type").agg(F.sum("drank").alias("r2"))
    dims = (days.agg(F.count(F.lit(1)).cast("long").alias("b"))
            .crossJoin(F.broadcast(
                types.agg(F.count(F.lit(1)).cast("long").alias("k")))))
    s = rsum.agg(F.sum(F.col("r2") * F.col("r2")).alias("sr"))
    return (dims.crossJoin(F.broadcast(s))
            .select(F.col("b").alias("b_days"), F.col("k").alias("k_types"),
                    (F.col("k") - 1).alias("df"),
                    F.round(F.lit(3.0) * F.col("sr")
                            / (F.col("b") * F.col("k") * (F.col("k") + 1))
                            - F.lit(3.0) * F.col("b") * (F.col("k") + 1), 6)
                    .alias("chi2_f")))


_AD_A, _AD_B = "purchase", "click"

_AD_ORACLE = f"""
WITH v AS (
  SELECT cast(floor(value * 100) AS bigint) AS cents,
         count(*) FILTER (WHERE event_type = '{_AD_A}') AS c1,
         count(*) FILTER (WHERE event_type = '{_AD_B}') AS c2
  FROM events WHERE event_type IN ('{_AD_A}', '{_AD_B}')
  GROUP BY 1),
c AS (
  SELECT cents, c1 + c2 AS l,
         2 * sum(c1) OVER (ORDER BY cents) - c1 AS hm1,
         2 * sum(c1 + c2) OVER (ORDER BY cents) - (c1 + c2) AS hb,
         sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
  FROM v),
terms AS (
  SELECT n1, n2, n1 + n2 AS nn,
         cast(round(1e9 * l
              * cast((n1 + n2) * hm1 - n1 * hb AS double)
              * cast((n1 + n2) * hm1 - n1 * hb AS double)
              / (cast(hb AS double) * (2 * (n1 + n2) - hb)
                 - (n1 + n2) * l) / (n1 + n2)) AS bigint) AS t9
  FROM c
  WHERE cast(hb AS double) * (2 * (n1 + n2) - hb) - (n1 + n2) * l > 0)
SELECT cast(max(n1) AS bigint) AS n1, cast(max(n2) AS bigint) AS n2,
       round((cast(max(nn) AS double) - 1) / max(nn)
             * (cast(sum(t9) AS double) / max(n1)
                + cast(sum(t9) AS double) / max(n2)) / 1e9, 6)
         AS a2_stat
FROM terms"""


@register(
    "anderson_darling_value",
    oracle=_AD_ORACLE,
    tags=("statistics", "drift", "evaluation"),
)
def anderson_darling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A^2 (Scholz-Stephens midrank/ties
    version, k=2) between purchase and click `value` distributions on the
    integer-cents lattice. With two samples the per-sample inner sums
    coincide ((N*M1 - n1*B)^2 = (N*M2 - n2*B)^2 since M1+M2=B), so ONE
    term column serves both, divided by n1 and n2 at the end. Doubled
    half-step cumulatives (hm1 = 2*Mbar_1, hb = 2*Bbar) keep midranks
    integral; the doubling cancels between numerator and denominator
    (num^2/4 over den4/4). Each value's term is snapped to the 1e-9
    lattice before the integer sum."""
    e = load_table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type").isin(_AD_A, _AD_B))
         .select(F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
                 "event_type")
         .groupBy("cents")
         .agg(F.count(F.when(F.col("event_type") == _AD_A, 1)).alias("c1"),
              F.count(F.when(F.col("event_type") == _AD_B, 1)).alias("c2")))
    wc = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = v.select(
        "cents", (F.col("c1") + F.col("c2")).alias("l"),
        (2 * F.sum("c1").over(wc) - F.col("c1")).alias("hm1"),
        (2 * F.sum(F.col("c1") + F.col("c2")).over(wc)
         - (F.col("c1") + F.col("c2"))).alias("hb"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"))
    nn = F.col("n1") + F.col("n2")
    # num <= N*2N ~ 3e9 at sf0.1: exact as double (< 2^53); squaring in
    # DOUBLE, not int64 — num^2 ~ 1e19 would wrap bigint.
    num = (nn * F.col("hm1") - F.col("n1") * F.col("hb")).cast("double")
    den = (F.col("hb").cast("double") * (2 * nn - F.col("hb"))
           - nn * F.col("l"))
    terms = (c.filter(den > 0)
             .select("n1", "n2", nn.alias("nn"),
                     F.round(F.lit(1e9) * F.col("l")
                             * num * num / den / nn)
                     .cast("long").alias("t9")))
    return terms.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round((F.max("nn").cast("double") - 1) / F.max("nn")
                * (F.sum("t9").cast("double") / F.max("n1")
                   + F.sum("t9").cast("double") / F.max("n2"))
                / 1e9, 6).alias("a2_stat"))
