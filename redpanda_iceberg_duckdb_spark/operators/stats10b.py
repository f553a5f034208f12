"""Two-sample Kolmogorov-Smirnov distance and one-way ANOVA — the
distribution-comparison tests an experimentation/monitoring pipeline runs
beside the existing PSI (drift10.py) and Mann-Whitney AUC (auc_eval.py).

Exactness. Values ride as exact integer cents. The KS statistic is
computed on the CROSS-MULTIPLIED lattice: D_scaled =
max |cum1*n2 - cum2*n1| over distinct cents, an exact bigint max, so the
sup and its location are integer arithmetic; only the final division by
n1*n2 is floating (one op, deterministic). ANOVA's sums of squares come
from exact bigint sufficient statistics (n, sum(cents), sum(cents^2))
per group; the handful of doubles combined afterwards are k=5 group
terms rounded at 6 decimals.

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


def _anova_oracle() -> str:
    return """
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
         sum(cast(s_h AS double) * s_h / n_h) AS between_raw,
         cast(sum(s_h) AS bigint) AS s,
         cast(sum(q_h) AS bigint) AS q
  FROM s)
SELECT n, k,
       round((between_raw - cast(s AS double) * s / n) / 1e4, 4) AS ssb,
       round((q - between_raw) / 1e4, 4) AS ssw,
       round(((between_raw - cast(s AS double) * s / n) / (k - 1))
             / ((q - between_raw) / (n - k)), 6) AS f_stat,
       round((between_raw - cast(s AS double) * s / n)
             / (q - cast(s AS double) * s / n), 6) AS eta_sq
FROM t"""


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
    cents = F.floor(F.col("value") * 100).cast("bigint")
    s = (e.select(F.col("event_type"), cents.alias("cents"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n_h"),
              F.sum("cents").alias("s_h"),
              F.sum(F.col("cents") * F.col("cents")).alias("q_h")))
    t = s.agg(
        F.sum("n_h").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("s_h").cast("double") * F.col("s_h") / F.col("n_h"))
        .alias("between_raw"),
        F.sum("s_h").cast("long").alias("s"),
        F.sum("q_h").cast("long").alias("q"))
    ssb = F.col("between_raw") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("between_raw")
    sst = F.col("q") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return t.select(
        "n", "k",
        F.round(ssb / 1e4, 4).alias("ssb"),
        F.round(ssw / 1e4, 4).alias("ssw"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))),
                6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"))
