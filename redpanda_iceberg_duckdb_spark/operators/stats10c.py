"""Kruskal-Wallis rank test and a seeded permutation test — the
nonparametric / resampling closers of the inference tier (beside ANOVA's
moment F-test, Mann-Whitney's two-group AUC, and the bootstrap CIs).

Kruskal-Wallis (the k-group Mann-Whitney): pooled ranks with MIDRANKS
for ties. Determinism trick: the DOUBLED midrank of a tied run is
2*(cum count before) + (run length) + 1 — an exact integer — so every
per-group rank sum is a bigint and only the final H assembly (a fixed
k=5-term formula) is floating, rounded at 6. Rank cumulation uses the
two-phase bucketed-ECDF pattern (stats10b.py): no global sort.

Permutation test: 64 label permutations drawn from the cross-engine md5
hash (functions/hashing.py) — ONE digest per event
(md5('pt:'||event_id)), with permutation b reassigning the event by BIT
b of the 128-bit digest (md5_bit_sql; B = 64 <= 128), so both engines
materialize the IDENTICAL 64 pseudo-random relabelings with zero
coordination and one hash per event instead of 64 (the round-10
verdict's avoidable constant). The extremeness comparison |s1*n2 - s2*n1| * (N1*N2) >=
|S1*N2 - S2*N1| * (n1*n2) cross-multiplies to avoid division entirely;
the products exceed int64 at sf0.1 so they ride as decimal(38,0) —
exact 128-bit integer arithmetic in both engines. One explode(64) +
one map-side-combinable aggregate; p-value = (1 + #extreme) / (B + 1)
(Phipson & Smyth 2010 add-one convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from ..functions.digestbits import md5_bit_sql

_BUCKET = 2048       # cents per rank bucket (value domain is bounded)
_B = 64              # permutations
_PA, _PB = "purchase", "click"


def _kw_oracle() -> str:
    return f"""
WITH v AS (
  SELECT event_type, cast(floor(value * 100) AS bigint) AS cents
  FROM events),
g AS (
  SELECT cents, event_type, count(*) AS c FROM v GROUP BY 1, 2),
tot AS (
  SELECT cents, sum(c) AS t FROM g GROUP BY 1),
cum AS (
  SELECT cents, t,
         coalesce(sum(t) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM tot),
mr AS (  -- doubled midrank of each tied run: exact integer
  SELECT cents, 2 * before + t + 1 AS mr2, t FROM cum),
rs AS (
  SELECT g.event_type, cast(count(*) AS bigint) AS cnt_groups,
         sum(g.c) AS n_h, sum(g.c * m.mr2) AS r2_h
  FROM g JOIN mr m ON m.cents = g.cents GROUP BY g.event_type),
n AS (SELECT cast(sum(n_h) AS bigint) AS n, count(*) AS k FROM rs),
ties AS (
  SELECT sum(t * t * t - t) AS tcorr,
         sum(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS n_tie_runs
  FROM mr),
h AS (
  SELECT n.n, n.k,
         12.0 / (n.n * (n.n + 1.0))
           * (SELECT sum(cast(r2_h AS double) * r2_h / (4.0 * n_h))
              FROM rs)
           - 3.0 * (n.n + 1) AS h_raw,
         1.0 - cast(t.tcorr AS double)
             / (cast(n.n AS double) * n.n * n.n - n.n) AS corr,
         t.n_tie_runs
  FROM n, ties t)
SELECT n, cast(k AS bigint) AS k,
       cast(n_tie_runs AS bigint) AS n_tie_runs,
       round(h_raw, 6) AS h_stat,
       round(h_raw / corr, 6) AS h_tie_corrected
FROM h"""


@register(
    "kruskal_wallis_value",
    oracle=_kw_oracle(),
    tags=("evaluation", "statistics", "scale-pattern"),
)
def kruskal_wallis_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, k, n_tie_runs, h_stat, h_tie_corrected): Kruskal-Wallis H over
    `value` across the five event types, doubled-midrank exact integers
    via two-phase bucketed cumulation (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type",
                 F.floor(F.col("value") * 100).cast("bigint").alias("cents"))
    g = (v.groupBy("cents", "event_type")
         .agg(F.count(F.lit(1)).alias("c")))
    tot = (g.groupBy("cents").agg(F.sum("c").alias("t"))
           .withColumn("bucket", F.expr(f"cents div {_BUCKET}")))
    wb = W.partitionBy("bucket").orderBy("cents") \
        .rowsBetween(W.unboundedPreceding, -1)
    local = tot.withColumn("lb", F.coalesce(F.sum("t").over(wb), F.lit(0)))
    btot = tot.groupBy("bucket").agg(F.sum("t").alias("bt"))
    wo = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offs = (btot.withColumn("off",
                            F.coalesce(F.sum("bt").over(wo), F.lit(0)))
            .select("bucket", "off"))
    mr = (local.join(F.broadcast(offs), "bucket")
          .select("cents", "t",
                  (2 * (F.col("lb") + F.col("off")) + F.col("t") + 1)
                  .alias("mr2")))
    rs = (g.join(mr.select("cents", "mr2"), "cents")
          .groupBy("event_type")
          .agg(F.sum("c").alias("n_h"),
               F.sum(F.col("c") * F.col("mr2")).alias("r2_h")))
    n = rs.agg(F.sum("n_h").cast("long").alias("n"),
               F.count(F.lit(1)).cast("long").alias("k"))
    ties = mr.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("tcorr"),
        F.sum(F.when(F.col("t") > 1, 1).otherwise(0)).alias("n_tie_runs"))
    sumterm = rs.agg(
        F.sum(F.col("r2_h").cast("double") * F.col("r2_h")
              / (4.0 * F.col("n_h"))).alias("st"))
    out = (n.crossJoin(F.broadcast(ties))
           .crossJoin(F.broadcast(sumterm)))
    h_raw = (12.0 / (F.col("n") * (F.col("n") + F.lit(1.0))) * F.col("st")
             - 3.0 * (F.col("n") + 1))
    corr = (F.lit(1.0) - F.col("tcorr").cast("double")
            / (F.col("n").cast("double") * F.col("n") * F.col("n")
               - F.col("n")))
    return out.select(
        "n", "k", F.col("n_tie_runs").cast("long").alias("n_tie_runs"),
        F.round(h_raw, 6).alias("h_stat"),
        F.round(h_raw / corr, 6).alias("h_tie_corrected"))


def _perm_oracle() -> str:
    h = md5_bit_sql("v.dg", "b.b")
    return f"""
WITH v AS (
  SELECT event_id, cast(floor(value * 100) AS bigint) AS cents,
         event_type, md5('pt:' || event_id) AS dg
  FROM events WHERE event_type IN ('{_PA}', '{_PB}')),
obs AS (
  SELECT sum(CASE WHEN event_type = '{_PA}' THEN cents END) AS s1,
         count(CASE WHEN event_type = '{_PA}' THEN 1 END) AS n1,
         sum(CASE WHEN event_type = '{_PB}' THEN cents END) AS s2,
         count(CASE WHEN event_type = '{_PB}' THEN 1 END) AS n2
  FROM v),
perms AS (
  SELECT v.event_id, v.cents, b.b, {h} AS side
  FROM v, lateral (SELECT unnest(generate_series(0, {_B - 1})) AS b) b),
pstat AS (
  SELECT b,
         sum(CASE WHEN side = 0 THEN cents END) AS s1,
         count(CASE WHEN side = 0 THEN 1 END) AS n1,
         sum(CASE WHEN side = 1 THEN cents END) AS s2,
         count(CASE WHEN side = 1 THEN 1 END) AS n2
  FROM perms GROUP BY b),
cmp AS (
  SELECT p.b,
         CASE WHEN abs(cast(p.s1 AS decimal(38,0)) * p.n2
                       - cast(p.s2 AS decimal(38,0)) * p.n1)
                   * (cast(o.n1 AS decimal(38,0)) * o.n2)
              >= abs(cast(o.s1 AS decimal(38,0)) * o.n2
                     - cast(o.s2 AS decimal(38,0)) * o.n1)
                   * (cast(p.n1 AS decimal(38,0)) * p.n2)
              THEN 1 ELSE 0 END AS extreme
  FROM pstat p, obs o WHERE p.n1 > 0 AND p.n2 > 0)
SELECT cast({_B} AS bigint) AS n_perms,
       cast(sum(extreme) AS bigint) AS n_extreme,
       round((1.0 + sum(extreme)) / ({_B} + 1.0), 6) AS p_value
FROM cmp"""


@register(
    "hash_permutation_test",
    oracle=_perm_oracle(),
    tags=("evaluation", "statistics", "resampling"),
)
def hash_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_perms, n_extreme, p_value): 64-permutation mean-difference test
    (purchase vs click values) with md5-seeded cross-engine relabelings
    and exact decimal(38,0) cross-multiplied comparisons (module
    docstring)."""
    e = load_table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type").isin(_PA, _PB))
         .select("event_id", "event_type",
                 F.floor(F.col("value") * 100).cast("bigint")
                 .alias("cents")))
    obs = v.agg(
        F.sum(F.when(F.col("event_type") == _PA, F.col("cents")))
        .alias("os1"),
        F.count(F.when(F.col("event_type") == _PA, 1)).alias("on1"),
        F.sum(F.when(F.col("event_type") == _PB, F.col("cents")))
        .alias("os2"),
        F.count(F.when(F.col("event_type") == _PB, 1)).alias("on2"))
    # ONE digest per event before the explode; permutation b = bit b.
    perms = (v.withColumn("dg", F.md5(F.concat(F.lit("pt:"),
                                               F.col("event_id"))))
        .withColumn("b", F.explode(F.array(
            *[F.lit(b) for b in range(_B)])))
        .withColumn("side", F.expr(md5_bit_sql("dg", "b"))))
    pstat = (perms.groupBy("b").agg(
        F.sum(F.when(F.col("side") == 0, F.col("cents"))).alias("s1"),
        F.count(F.when(F.col("side") == 0, 1)).alias("n1"),
        F.sum(F.when(F.col("side") == 1, F.col("cents"))).alias("s2"),
        F.count(F.when(F.col("side") == 1, 1)).alias("n2")))
    dec = "decimal(38,0)"
    j = (pstat.filter((F.col("n1") > 0) & (F.col("n2") > 0))
         .crossJoin(F.broadcast(obs)))
    extreme = F.when(
        F.abs(F.col("s1").cast(dec) * F.col("n2")
              - F.col("s2").cast(dec) * F.col("n1"))
        * (F.col("on1").cast(dec) * F.col("on2"))
        >= F.abs(F.col("os1").cast(dec) * F.col("on2")
                 - F.col("os2").cast(dec) * F.col("on1"))
        * (F.col("n1").cast(dec) * F.col("n2")), 1).otherwise(0)
    return (j.select(extreme.alias("extreme"))
            .agg(F.lit(_B).cast("long").alias("n_perms"),
                 F.sum("extreme").cast("long").alias("n_extreme"),
                 F.round((1.0 + F.sum("extreme")) / (_B + 1.0), 6)
                 .alias("p_value")))
