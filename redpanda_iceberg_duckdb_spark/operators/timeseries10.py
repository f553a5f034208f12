"""Autocorrelation and cross-correlation of hourly event series — the
lag-structure diagnostics (seasonality fingerprint, lead/lag between two
activity streams) that sit beside the repo's EWMA/OLS/Theil-Sen trend
tier.

Exactness. Hourly counts y_t are integers on a DENSE hour spine (missing
hours are true zeros, materialized from a min..max hour sequence — no
silent gaps). Mean-centering is done on the N-SCALED lattice:
(N*y_t - S) is an exact bigint, so every lag's covariance numerator and
the variance denominators are exact bigint sums; the single final
division (and, for the cross-correlation, one IEEE-exact sqrt) happens
once per output row and rounds at 6.

Scale. One scan -> per-hour counts (map-side combinable); the spine is
an exploded sequence off a 1-row min/max aggregate; each lagged pair set
is ONE equi-join on (hour+lag) with the lag list exploded on the probe
side (|lags| x hours rows, hash-partitioned — no window over a global
order, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_MAX_LAG = 8
_X, _Y = "view", "purchase"  # pairs are (x_t, y_{t+lag}): +lag = y follows x
_CCF_LAGS = list(range(-6, 7))


def _hourly_spine_sql(filt: str = "TRUE") -> str:
    """Dense (hour_idx, cnt) CTE body over events matching `filt`."""
    return f"""
h AS (
  SELECT cast(floor(epoch(ts) / 3600) AS bigint) AS hr, count(*) AS c
  FROM events WHERE {filt} GROUP BY 1),
b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
spine AS (
  SELECT g.hr FROM b, lateral (
    SELECT unnest(generate_series(b.lo, b.hi)) AS hr) g),
d AS (
  SELECT s.hr, coalesce(h.c, 0) AS c FROM spine s LEFT JOIN h USING (hr))"""


def _acf_oracle() -> str:
    return f"""
WITH {_hourly_spine_sql()},
t AS (SELECT cast(count(*) AS bigint) AS n,
             cast(sum(c) AS bigint) AS s FROM d),
den AS (
  SELECT sum((t.n * d.c - t.s) * (t.n * d.c - t.s)) AS dvar
  FROM d, t),
lags AS (SELECT unnest(generate_series(1, {_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag,
         count(*) AS n_pairs,
         sum((t.n * a.c - t.s) * (t.n * b.c - t.s)) AS numer
  FROM lags l
  JOIN d a ON TRUE
  JOIN d b ON b.hr = a.hr + l.lag
  CROSS JOIN t
  GROUP BY l.lag)
SELECT p.lag AS lag, cast(p.n_pairs AS bigint) AS n_pairs,
       round(cast(p.numer AS double) / den.dvar, 6) AS acf
FROM pairs p, den ORDER BY p.lag"""


@register(
    "acf_hourly_lags",
    oracle=_acf_oracle(),
    tags=("timeseries", "evaluation", "scale-pattern"),
)
def acf_hourly_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag, n_pairs, acf): autocorrelation of the dense hourly event-count
    series at lags 1..8, exact N-scaled integer moments (module
    docstring)."""
    # r16 scan-audit collapse (guide §2.4 / r10 multi-branch lesson): the
    # dense hourly frame feeds t, the variance aggregate, AND both sides
    # of every lagged pair join — the plan re-ran the events scan 12x.
    # One eager checkpoint of the O(hours) frame; every branch reads the
    # RDD (12 scans -> 2, the spine's min/max pass and the count pass).
    d = _dense_hourly(spark, sf_dir, F.lit(True)).localCheckpoint(
        eager=True)
    t = d.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("c").cast("long").alias("s"))
    dt = d.crossJoin(F.broadcast(t)) \
        .select("hr", (F.col("n") * F.col("c") - F.col("s")).alias("z"))
    den = dt.agg(F.sum(F.col("z") * F.col("z")).alias("dvar"))
    probe = (dt.select("hr", F.col("z").alias("za"))
             .withColumn("lag", F.explode(F.array(
                 *[F.lit(k) for k in range(1, _MAX_LAG + 1)])))
             .withColumn("hr_b", F.col("hr") + F.col("lag")))
    pairs = (probe.join(dt.select(F.col("hr").alias("hr_b"),
                                  F.col("z").alias("zb")), "hr_b")
             .groupBy("lag")
             .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                  F.sum(F.col("za") * F.col("zb")).alias("numer")))
    return (pairs.crossJoin(F.broadcast(den))
            .select(F.col("lag").cast("int").alias("lag"), "n_pairs",
                    F.round(F.col("numer").cast("double") / F.col("dvar"),
                            6).alias("acf"))
            .orderBy("lag"))


def _ccf_oracle() -> str:
    return f"""
WITH hx AS (
  SELECT cast(floor(epoch(ts) / 3600) AS bigint) AS hr, count(*) AS c
  FROM events WHERE event_type = '{_X}' GROUP BY 1),
hy AS (
  SELECT cast(floor(epoch(ts) / 3600) AS bigint) AS hr, count(*) AS c
  FROM events WHERE event_type = '{_Y}' GROUP BY 1),
b AS (
  SELECT least((SELECT min(hr) FROM hx), (SELECT min(hr) FROM hy)) AS lo,
         greatest((SELECT max(hr) FROM hx), (SELECT max(hr) FROM hy)) AS hi),
spine AS (
  SELECT g.hr FROM b, lateral (
    SELECT unnest(generate_series(b.lo, b.hi)) AS hr) g),
dx AS (SELECT s.hr, coalesce(hx.c, 0) AS c
       FROM spine s LEFT JOIN hx USING (hr)),
dy AS (SELECT s.hr, coalesce(hy.c, 0) AS c
       FROM spine s LEFT JOIN hy USING (hr)),
t AS (SELECT cast(count(*) AS bigint) AS n,
             cast((SELECT sum(c) FROM dx) AS bigint) AS sx,
             cast((SELECT sum(c) FROM dy) AS bigint) AS sy
      FROM spine),
den AS (
  SELECT (SELECT sum((t.n * c - t.sx) * (t.n * c - t.sx))
          FROM dx, t) AS vx,
         (SELECT sum((t.n * c - t.sy) * (t.n * c - t.sy))
          FROM dy, t) AS vy),
lags AS (SELECT unnest(generate_series({_CCF_LAGS[0]},
                                       {_CCF_LAGS[-1]})) AS lag),
pairs AS (
  SELECT l.lag, count(*) AS n_pairs,
         sum((t.n * a.c - t.sx) * (t.n * b.c - t.sy)) AS numer
  FROM lags l
  JOIN dx a ON TRUE
  JOIN dy b ON b.hr = a.hr + l.lag
  CROSS JOIN t GROUP BY l.lag)
SELECT p.lag AS lag, cast(p.n_pairs AS bigint) AS n_pairs,
       round(cast(p.numer AS double)
             / sqrt(cast(den.vx AS double) * den.vy), 6) AS ccf
FROM pairs p, den ORDER BY p.lag"""


@register(
    "crosscorr_lead_lag",
    oracle=_ccf_oracle(),
    tags=("timeseries", "evaluation", "scale-pattern"),
)
def crosscorr_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lag, n_pairs, ccf): cross-correlation between the view (x) and
    purchase (y) hourly series at lags -6..6, pairing (x_t, y_{t+lag})
    — a positive-lag peak means purchases FOLLOW views by `lag` hours;
    shared dense spine, exact integer moments (module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr")
    # r16 scan-audit collapse (guide §2.4 / r10 multi-branch lesson): hx
    # and hy feed bounds, the dense series, the scaled moments, the
    # variance aggregates and every lagged pair join — the plan re-ran
    # the events scan 40x (each branch re-derived its own copy). ONE
    # events scan now builds the (event_type, hr) count frame — bounded
    # by 2 x hours — eagerly checkpointed; hx/hy are filters of the RDD,
    # so every downstream branch is parquet-free (40 scans -> 1).
    h2 = (ev.filter(F.col("event_type").isin(_X, _Y))
          .select(F.col("event_type").alias("et"), hr)
          .groupBy("et", "hr").agg(F.count(F.lit(1)).alias("c"))
          .localCheckpoint(eager=True))
    hx = h2.filter(F.col("et") == _X).select("hr", "c")
    hy = h2.filter(F.col("et") == _Y).select("hr", "c")
    bounds = (hx.select("hr").union(hy.select("hr"))
              .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi")))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("hr"))
    dx = (spine.join(hx, "hr", "left")
          .select("hr", F.coalesce("c", F.lit(0)).alias("c")))
    dy = (spine.join(hy, "hr", "left")
          .select("hr", F.coalesce("c", F.lit(0)).alias("c")))
    t = (spine.agg(F.count(F.lit(1)).cast("long").alias("n"))
         .crossJoin(F.broadcast(
             dx.agg(F.sum("c").cast("long").alias("sx"))))
         .crossJoin(F.broadcast(
             dy.agg(F.sum("c").cast("long").alias("sy")))))
    zx = (dx.crossJoin(F.broadcast(t))
          .select("hr", (F.col("n") * F.col("c") - F.col("sx")).alias("z")))
    zy = (dy.crossJoin(F.broadcast(t))
          .select("hr", (F.col("n") * F.col("c") - F.col("sy")).alias("z")))
    den = (zx.agg(F.sum(F.col("z") * F.col("z")).alias("vx"))
           .crossJoin(zy.agg(F.sum(F.col("z") * F.col("z")).alias("vy"))))
    probe = (zx.select("hr", F.col("z").alias("za"))
             .withColumn("lag", F.explode(F.array(
                 *[F.lit(k) for k in _CCF_LAGS])))
             .withColumn("hr_b", F.col("hr") + F.col("lag")))
    pairs = (probe.join(zy.select(F.col("hr").alias("hr_b"),
                                  F.col("z").alias("zb")), "hr_b")
             .groupBy("lag")
             .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                  F.sum(F.col("za") * F.col("zb")).alias("numer")))
    return (pairs.crossJoin(F.broadcast(den))
            .select(F.col("lag").cast("int").alias("lag"), "n_pairs",
                    F.round(F.col("numer").cast("double")
                            / F.sqrt(F.col("vx").cast("double")
                                     * F.col("vy")), 6).alias("ccf"))
            .orderBy("lag"))


def _dense_hourly(spark: SparkSession, sf_dir: str, cond) -> DataFrame:
    """Dense (hr, c) hourly counts over events matching `cond`."""
    ev = load_table(spark, sf_dir, "events").filter(cond)
    h = (ev.select(F.floor(F.unix_timestamp("ts") / 3600)
                   .cast("long").alias("hr"))
         .groupBy("hr").agg(F.count(F.lit(1)).alias("c")))
    spine = (h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
             .select(F.explode(F.sequence("lo", "hi")).alias("hr")))
    return (spine.join(h, "hr", "left")
            .select("hr", F.coalesce("c", F.lit(0)).alias("c")))
