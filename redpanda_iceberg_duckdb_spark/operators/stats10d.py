"""Benjamini-Hochberg FDR control over a family of randomization tests —
the multiple-comparisons closer of the inference tier (beside the single
permutation test of stats10c.py; a training-data pipeline that screens
many sources/segments at once needs the FDR discipline, not m naked
p-values).

Family: the m = 10 pairwise mean-difference tests among the five event
types. Each test reuses the stats10c machinery — md5-seeded relabelings,
cross-multiplied |s1*n2 - s2*n1| extremeness on exact integers, decimal
(38,0) for the 128-bit products, Phipson & Smyth (2010) add-one p-values
— but randomizes at the BLOCK level: events pre-aggregate into
(type, md5-cell) blocks of sufficient statistics (one distributed scan,
~5x1024 cells), and each of the B = 99 replicates flips whole blocks
between the two sides. Blocks are exchangeable under H0, so this is a
standard Monte-Carlo block randomization (e.g. Good, "Permutation Tests",
ch. 11) whose entire replicate ensemble costs O(cells x B) — independent
of the event count, the property that makes 99 replicates x 10 hypotheses
free at 100 TB (the only full-data pass is the cell aggregation).

Replicate seeding costs ONE md5 per (pair, type, cell): replicate b's
side assignment is bit b of the block's 128-bit digest (B = 99 <= 128),
extracted by the engine-neutral hex-nibble expression
functions/digestbits.md5_bit_sql — identical bits in Spark and DuckDB. This
removes the round-10 verdict's 99x hash constant (one digest per
exploded row) with unchanged block-randomization semantics: md5 bits
are independent fair coins across both cells and bit positions.

BH (Benjamini & Hochberg 1995, JRSS-B): sort the m p-values ascending,
find the largest i with p_(i) <= i*alpha/m, reject ranks 1..i. With
p_num = 1 + #extreme over denominator B+1 = 100 and alpha = 1/5, the
step-up condition cross-multiplies to the pure-integer
`p_num * m * 5 <= rank * (B+1)` — no float thresholds, both engines agree
exactly. Output: every pair with its p-value numerator, BH rank, and
reject flag.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from ..functions.digestbits import md5_bit_sql
from ..functions.hashing import md5_mod_duck, md5_mod_spark

_TYPES = ["click", "error", "purchase", "signup", "view"]
_PAIRS = [(f"{a}_vs_{b}", a, b) for a, b in combinations(_TYPES, 2)]
_M = len(_PAIRS)          # 10 hypotheses
_B = 99                   # block-randomization replicates -> denominator 100
_CELLS = 1024             # md5 blocks per event type
_ALPHA_INV = 5            # alpha = 1/5


def _oracle() -> str:
    cell = md5_mod_duck("'fc:' || event_id", _CELLS)
    side = md5_bit_sql("jc.dg", "r.b")
    values = ", ".join(f"('{p}', '{a}', '{b}')" for p, a, b in _PAIRS)
    return f"""
WITH v AS (
  SELECT event_type AS t, cast(floor(value * 100) AS bigint) AS cents,
         {cell} AS cell
  FROM events),
cells AS (
  SELECT t, cell, sum(cents) AS s, count(*) AS c FROM v GROUP BY 1, 2),
pairs AS (SELECT * FROM (VALUES {values}) AS x(pid, ta, tb)),
obs AS (
  SELECT p.pid,
         sum(CASE WHEN cl.t = p.ta THEN cl.s END) AS s1,
         sum(CASE WHEN cl.t = p.ta THEN cl.c END) AS n1,
         sum(CASE WHEN cl.t = p.tb THEN cl.s END) AS s2,
         sum(CASE WHEN cl.t = p.tb THEN cl.c END) AS n2
  FROM pairs p JOIN cells cl ON cl.t IN (p.ta, p.tb) GROUP BY 1),
reps AS (SELECT unnest(generate_series(0, {_B - 1})) AS b),
jc AS (
  SELECT p.pid, cl.t, cl.cell, cl.s, cl.c,
         md5('fdr' || p.pid || ':' || cl.t || ':' || cl.cell) AS dg
  FROM pairs p JOIN cells cl ON cl.t IN (p.ta, p.tb)),
perm AS (
  SELECT jc.pid, r.b,
         sum(CASE WHEN {side} = 0 THEN jc.s END) AS s1,
         sum(CASE WHEN {side} = 0 THEN jc.c END) AS n1,
         sum(CASE WHEN {side} = 1 THEN jc.s END) AS s2,
         sum(CASE WHEN {side} = 1 THEN jc.c END) AS n2
  FROM jc CROSS JOIN reps r
  GROUP BY 1, 2),
cmp AS (
  SELECT pm.pid,
         CASE WHEN abs(cast(pm.s1 AS decimal(38,0)) * pm.n2
                       - cast(pm.s2 AS decimal(38,0)) * pm.n1)
                   * (cast(o.n1 AS decimal(38,0)) * o.n2)
              >= abs(cast(o.s1 AS decimal(38,0)) * o.n2
                     - cast(o.s2 AS decimal(38,0)) * o.n1)
                   * (cast(pm.n1 AS decimal(38,0)) * pm.n2)
              THEN 1 ELSE 0 END AS extreme
  FROM perm pm JOIN obs o ON o.pid = pm.pid
  WHERE pm.n1 > 0 AND pm.n2 > 0),
pv AS (SELECT pid, 1 + sum(extreme) AS p_num FROM cmp GROUP BY 1),
rk AS (
  SELECT pid, p_num,
         row_number() OVER (ORDER BY p_num, pid) AS rnk
  FROM pv),
kstar AS (
  SELECT coalesce(max(CASE WHEN p_num * {_M} * {_ALPHA_INV}
                                <= rnk * {_B + 1} THEN rnk END), 0) AS k
  FROM rk)
SELECT r.pid AS pair, cast(r.p_num AS bigint) AS p_num,
       cast(r.rnk AS int) AS bh_rank,
       CASE WHEN r.rnk <= k.k THEN 1 ELSE 0 END AS rejected
FROM rk r, kstar k ORDER BY r.rnk"""


@register(
    "bh_fdr_discoveries",
    oracle=_oracle(),
    tags=("evaluation", "statistics", "resampling", "scale-pattern"),
)
def bh_fdr_discoveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair, p_num, bh_rank, rejected): Benjamini-Hochberg step-up at
    alpha = 0.2 over the 10 pairwise event-type mean-difference block
    randomization tests; p_num is the add-one p-value numerator over
    denominator B+1 = 100 (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        F.col("event_type").alias("t"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        F.expr(md5_mod_spark("concat('fc:', event_id)", _CELLS))
        .alias("cell"))
    cells = (v.groupBy("t", "cell")
             .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("c")))
    pairs = spark.createDataFrame(_PAIRS, "pid string, ta string, tb string")
    # r15 optimization (guide §2.4): j feeds both the observed-statistic
    # aggregate and the 100-replicate permutation expansion — two full
    # evaluations of the events scan + per-event md5 cell hash without
    # materialization. localCheckpoint the (pair, type, cell) block
    # digest table ((types x cells)-bounded) so the corpus pass runs once.
    j = (cells.join(F.broadcast(pairs),
                    (F.col("t") == F.col("ta")) | (F.col("t") == F.col("tb")))
         # eager: obs and perm branches of one action would race-compute
         # a lazy checkpoint (r12 lesson)
         .localCheckpoint(eager=True))

    def _sides(df: DataFrame, flag) -> list:
        return [
            F.sum(F.when(flag == 0, F.col("s"))).alias("s1"),
            F.sum(F.when(flag == 0, F.col("c"))).alias("n1"),
            F.sum(F.when(flag == 1, F.col("s"))).alias("s2"),
            F.sum(F.when(flag == 1, F.col("c"))).alias("n2"),
        ]

    obs = j.groupBy("pid").agg(
        F.sum(F.when(F.col("t") == F.col("ta"), F.col("s"))).alias("s1"),
        F.sum(F.when(F.col("t") == F.col("ta"), F.col("c"))).alias("n1"),
        F.sum(F.when(F.col("t") == F.col("tb"), F.col("s"))).alias("s2"),
        F.sum(F.when(F.col("t") == F.col("tb"), F.col("c"))).alias("n2"))
    # ONE digest per (pair, type, cell) block, computed BEFORE the
    # replicate explode; replicate b's side = bit b of the digest
    # (md5_bit_sql — bit-identical to the oracle's extraction).
    perm = (j.withColumn(
                "dg", F.md5(F.concat(F.lit("fdr"), F.col("pid"), F.lit(":"),
                                     F.col("t"), F.lit(":"), F.col("cell"))))
            .withColumn("b", F.explode(F.array(
                *[F.lit(b) for b in range(_B)])))
            .withColumn("side", F.expr(md5_bit_sql("dg", "b")))
            .groupBy("pid", "b")
            .agg(*_sides(j, F.col("side"))))
    dec = "decimal(38,0)"
    o = obs.select(F.col("pid").alias("opid"),
                   F.col("s1").alias("os1"), F.col("n1").alias("on1"),
                   F.col("s2").alias("os2"), F.col("n2").alias("on2"))
    cmp = (perm.join(F.broadcast(o), perm["pid"] == o["opid"])
           .filter((F.col("n1") > 0) & (F.col("n2") > 0))
           .select("pid", F.when(
               F.abs(F.col("s1").cast(dec) * F.col("n2")
                     - F.col("s2").cast(dec) * F.col("n1"))
               * (F.col("on1").cast(dec) * F.col("on2"))
               >= F.abs(F.col("os1").cast(dec) * F.col("on2")
                        - F.col("os2").cast(dec) * F.col("on1"))
               * (F.col("n1").cast(dec) * F.col("n2")),
               1).otherwise(0).alias("extreme")))
    pv = cmp.groupBy("pid").agg((1 + F.sum("extreme")).alias("p_num"))
    rk = pv.withColumn(
        "rnk", F.row_number().over(W.orderBy("p_num", "pid")))  # m=10 rows
    kstar = rk.agg(F.coalesce(F.max(F.when(
        F.col("p_num") * _M * _ALPHA_INV <= F.col("rnk") * (_B + 1),
        F.col("rnk"))), F.lit(0)).alias("k"))
    return (rk.crossJoin(F.broadcast(kstar))
            .select(F.col("pid").alias("pair"),
                    F.col("p_num").cast("long").alias("p_num"),
                    F.col("rnk").cast("int").alias("bh_rank"),
                    F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0)
                    .alias("rejected"))
            .orderBy("bh_rank"))
