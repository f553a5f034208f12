"""Two-sample Kolmogorov-Smirnov distance and one-way ANOVA — the
distribution-comparison tests an experimentation/monitoring pipeline runs
beside the existing PSI (drift10.py) and Mann-Whitney AUC (auc_eval.py).

Exactness. Values ride as exact integer cents. The KS statistic is
computed on the CROSS-MULTIPLIED lattice: D_scaled =
max |cum1*n2 - cum2*n1| over distinct cents, an exact bigint max, so the
sup and its location are integer arithmetic; only the final division by
n1*n2 is floating (one op, deterministic). ANOVA's sums of squares come
from exact bigint sufficient statistics (n, sum(cents), sum(cents^2))
per group; each between-group term s_h^2/n_h rides the fixed-point
lattice floor(s_h^2 * 1e15 / n_h) — exact 128-bit integers whose sum is
order-insensitive — so every float the two engines see is derived from
identical integers (round-10 ADVICE #4; truncation < k/1e15 cents^2,
far below the 4/6-decimal output rounding).

Scale. The ECDF cumulative sums use the repo's two-phase pattern: cents
are range-bucketed by FIXED-WIDTH buckets (the value domain is bounded;
for open domains swap in approx-quantile cuts), within-bucket running
sums window-partition by bucket, and the <=32 bucket offsets are a tiny
broadcast — no global single-partition sort at any size. ANOVA is one
map-side-combinable aggregate + a k-row reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_A, _B = "purchase", "click"
_BUCKET = 2048  # cents per ECDF bucket; domain is [1, ~49100] cents


def _ks_oracle() -> str:
    return f"""
WITH v AS (
  SELECT cast(floor(value * 100) AS bigint) AS cents,
         count(*) FILTER (WHERE event_type = '{_A}') AS c1,
         count(*) FILTER (WHERE event_type = '{_B}') AS c2
  FROM events WHERE event_type IN ('{_A}', '{_B}')
  GROUP BY 1),
c AS (
  SELECT cents,
         sum(c1) OVER (ORDER BY cents) AS cum1,
         sum(c2) OVER (ORDER BY cents) AS cum2,
         sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
  FROM v),
g AS (
  SELECT cents, n1, n2, abs(cum1 * n2 - cum2 * n1) AS gap
  FROM c)
SELECT cast(max(n1) AS bigint) AS n1, cast(max(n2) AS bigint) AS n2,
       cast(max(gap) AS bigint) AS d_scaled,
       cast(min(CASE WHEN gap = (SELECT max(gap) FROM g) THEN cents END)
            AS bigint) AS ks_at_cents,
       round(cast(max(gap) AS double) / (max(n1) * max(n2)), 6) AS ks_stat
FROM g"""


@register(
    "ks_two_sample_value",
    oracle=_ks_oracle(),
    tags=("evaluation", "drift", "scale-pattern"),
)
def ks_two_sample_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n1, n2, d_scaled, ks_at_cents, ks_stat): exact two-sample KS
    distance between the `value` distributions of purchase vs click
    events; sup located on the integer cross-multiplied lattice
    (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type").isin(_A, _B))
         .select(F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
                 "event_type")
         .groupBy("cents")
         .agg(F.count(F.when(F.col("event_type") == _A, 1)).alias("c1"),
              F.count(F.when(F.col("event_type") == _B, 1)).alias("c2"))
         .withColumn("bucket", F.expr(f"cents div {_BUCKET}")))
    # Phase 1: within-bucket running sums (partitioned window — parallel).
    wb = W.partitionBy("bucket").orderBy("cents")
    local = (v.withColumn("l1", F.sum("c1").over(wb))
             .withColumn("l2", F.sum("c2").over(wb)))
    # Phase 2: bucket offsets over the <=32-row bucket summary (broadcast).
    totals = v.groupBy("bucket").agg(F.sum("c1").alias("t1"),
                                     F.sum("c2").alias("t2"))
    wo = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offs = (totals
            .withColumn("o1", F.coalesce(F.sum("t1").over(wo), F.lit(0)))
            .withColumn("o2", F.coalesce(F.sum("t2").over(wo), F.lit(0)))
            .select("bucket", "o1", "o2"))
    c = (local.join(F.broadcast(offs), "bucket")
         .select("cents",
                 (F.col("l1") + F.col("o1")).alias("cum1"),
                 (F.col("l2") + F.col("o2")).alias("cum2")))
    n = v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    g = (c.crossJoin(F.broadcast(n))
         .select("cents", "n1", "n2",
                 F.abs(F.col("cum1") * F.col("n2")
                       - F.col("cum2") * F.col("n1")).alias("gap")))
    mx = g.agg(F.max("gap").alias("mx"))
    return (g.join(F.broadcast(mx), g["gap"] == mx["mx"])
            .groupBy()
            .agg(F.max("n1").cast("long").alias("n1"),
                 F.max("n2").cast("long").alias("n2"),
                 F.max("gap").cast("long").alias("d_scaled"),
                 F.min("cents").cast("long").alias("ks_at_cents"),
                 F.round(F.max("gap").cast("double")
                         / (F.max("n1") * F.max("n2")), 6).alias("ks_stat")))


# Fixed-point lattice for the between-group term: each s_h^2/n_h rides as
# floor(s_h^2 * 1e15 / n_h) — an exact 128-bit integer in both engines
# (DuckDB hugeint floor-division, Spark decimal(38,0) mod-then-exact-
# division) — so the sufficient-stat reduction is ORDER-INSENSITIVE
# integer addition; no float summation whose order could differ across
# engines (round-10 ADVICE #4). Truncation error < k/1e15 cents^2, far
# below the 4/6-decimal output rounding. Headroom: s_h^2 * 1e15 needs
# n_h <= ~3e9 per group to stay under 38 digits; beyond that drop SCALE.
_ANOVA_SCALE = 10 ** 15


def _anova_oracle() -> str:
    return f"""
WITH s AS (
  SELECT event_type,
         count(*) AS n_h,
         sum(cast(floor(value * 100) AS bigint)) AS s_h,
         sum(cast(floor(value * 100) AS bigint)
             * cast(floor(value * 100) AS bigint)) AS q_h
  FROM events GROUP BY 1),
t AS (
  SELECT cast(sum(n_h) AS bigint) AS n,
         cast(count(*) AS bigint) AS k,
         sum((cast(s_h AS hugeint) * s_h * {_ANOVA_SCALE}) // n_h)
           AS between_s,
         cast(sum(s_h) AS bigint) AS s,
         cast(sum(q_h) AS bigint) AS q
  FROM s),
u AS (
  SELECT n, k,
         cast(greatest(between_s
              - (cast(s AS hugeint) * s * {_ANOVA_SCALE}) // n, 0)
              AS double) AS ssb_s,
         cast(cast(q AS hugeint) * {_ANOVA_SCALE} - between_s
              AS double) AS ssw_s,
         cast(cast(q AS hugeint) * {_ANOVA_SCALE}
              - (cast(s AS hugeint) * s * {_ANOVA_SCALE}) // n
              AS double) AS sst_s
  FROM t)
SELECT n, k,
       round(ssb_s / {_ANOVA_SCALE}e4, 4) AS ssb,
       round(ssw_s / {_ANOVA_SCALE}e4, 4) AS ssw,
       round((ssb_s / (k - 1)) / (ssw_s / (n - k)), 6) AS f_stat,
       round(ssb_s / sst_s, 6) AS eta_sq
FROM u"""


@register(
    "anova_f_oneway",
    oracle=_anova_oracle(),
    tags=("evaluation", "statistics"),
)
def anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, k, ssb, ssw, f_stat, eta_sq): one-way ANOVA of `value` across
    the five event types from exact bigint sufficient statistics; sums
    of squares reported in dollars^2 (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    cents = F.floor(F.col("value") * 100).cast("bigint")

    def _floor_div_scaled(num_sq_base, divisor):
        # floor(num^2 * SCALE / divisor) exactly: decimal mod, subtract,
        # then an exactly-divisible decimal division (mirrors the
        # oracle's hugeint // floor-division bit for bit).
        prod = (num_sq_base.cast(dec) * num_sq_base * F.lit(_ANOVA_SCALE))
        return ((prod - prod % divisor) / divisor).cast(dec)

    s = (e.select(F.col("event_type"), cents.alias("cents"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n_h"),
              F.sum("cents").alias("s_h"),
              F.sum(F.col("cents") * F.col("cents")).alias("q_h")))
    t = s.agg(
        F.sum("n_h").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(_floor_div_scaled(F.col("s_h"), F.col("n_h")))
        .cast(dec).alias("between_s"),
        F.sum("s_h").cast("long").alias("s"),
        F.sum("q_h").cast("long").alias("q"))
    u = t.select(
        "n", "k",
        F.greatest(F.col("between_s")
                   - _floor_div_scaled(F.col("s"), F.col("n")),
                   F.lit(0).cast(dec))
        .cast("double").alias("ssb_s"),
        (F.col("q").cast(dec) * _ANOVA_SCALE - F.col("between_s"))
        .cast("double").alias("ssw_s"),
        (F.col("q").cast(dec) * _ANOVA_SCALE
         - _floor_div_scaled(F.col("s"), F.col("n")))
        .cast("double").alias("sst_s"))
    return u.select(
        "n", "k",
        F.round(F.col("ssb_s") / (_ANOVA_SCALE * 1e4), 4).alias("ssb"),
        F.round(F.col("ssw_s") / (_ANOVA_SCALE * 1e4), 4).alias("ssw"),
        F.round((F.col("ssb_s") / (F.col("k") - 1))
                / (F.col("ssw_s") / (F.col("n") - F.col("k"))),
                6).alias("f_stat"),
        F.round(F.col("ssb_s") / F.col("sst_s"), 6).alias("eta_sq"))
