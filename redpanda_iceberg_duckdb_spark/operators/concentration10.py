"""Concentration / inequality statistics over keyed aggregates: the Gini
coefficient of customer spend and the Herfindahl-Hirschman index of
supplier revenue within each nation — the audits a data-mixture pipeline
runs to detect source-domination (one crawl domain owning a corpus) and
a BI pipeline runs on market share.

Gini via the rank identity (no pairwise |x_i - x_j| join):

    G = (2 * sum_i r_i x_i - (n + 1) * sum x) / (n * sum x)

with r_i the 1-based rank of x_i ascending. Ranking uses the two-phase
distributed pattern (range exchange -> local ranks -> broadcast offsets,
the auc_eval.py shape), never a single-partition global row_number.
Spend rides as exact integer cents, so every sum is exact (sum r*x tops
out ~6e16 at sf0.1 — int64 holds; the 100 TB variant lifts the product
sum to decimal(38,0), as the HHI below already does) and both engines
agree bit-for-bit before the single final division. Ties are ordered by
(cents, custkey) — a deterministic, engine-independent convention.

HHI = sum_s share_s^2 = sum_s rev_s^2 / (sum_s rev_s)^2 per nation; the
squared-cents numerator exceeds int64, so it accumulates in decimal(38,0)
(exact, order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_N_RANGE_PARTS = 32


def _gini_oracle() -> str:
    return """
WITH spend AS (
  SELECT o_custkey, sum(cast(floor(o_totalprice * 100) AS bigint)) AS cents
  FROM orders GROUP BY 1),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS r
  FROM spend)
SELECT cast(count(*) AS bigint) AS n_customers,
       cast(sum(cents) AS bigint) AS total_cents,
       round((2.0 * sum(r * cents) - (count(*) + 1.0) * sum(cents))
             / (cast(count(*) AS double) * sum(cents)), 6) AS gini
FROM ranked"""


@register(
    "gini_customer_spend",
    oracle=_gini_oracle(),
    tags=("concentration", "audit", "scale-pattern"),
)
def gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_customers, total_cents, gini): spend inequality across customers
    via the rank identity over two-phase distributed ranks (module
    docstring). The oracle ranks with a plain global row_number, so a
    green row proves the distributed ranking reproduces it exactly."""
    spend = (load_table(spark, sf_dir, "orders")
             .groupBy("o_custkey")
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
                  .alias("cents")))
    d = (spend.repartitionByRange(_N_RANGE_PARTS, "cents", "o_custkey")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    local = d.withColumn("lrank", F.row_number().over(
        W.partitionBy("pid").orderBy("cents", "o_custkey")))
    offsets = (d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn("offset", F.coalesce(
                   F.sum("cnt").over(
                       W.orderBy("pid")
                       .rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("pid", "offset"))
    ranked = (local.join(F.broadcast(offsets), "pid")
              .select("cents", (F.col("offset") + F.col("lrank")).alias("r")))
    n = F.count(F.lit(1))
    tot = F.sum("cents")
    gini = ((2.0 * F.sum(F.col("r") * F.col("cents"))
             - (n + F.lit(1.0)) * tot)
            / (n.cast("double") * tot))
    return ranked.agg(n.cast("long").alias("n_customers"),
                      tot.cast("long").alias("total_cents"),
                      F.round(gini, 6).alias("gini"))


def _hhi_oracle() -> str:
    return """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         sum(cast(floor(l.l_extendedprice * 100) AS bigint)) AS cents
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2),
nat AS (
  SELECT s_nationkey,
         count(*) AS n_suppliers,
         sum(cast(cents AS hugeint) * cents) AS sq,
         sum(cents) AS tot
  FROM rev GROUP BY 1)
SELECT s_nationkey AS nationkey, cast(n_suppliers AS bigint) AS n_suppliers,
       round(cast(sq AS double) / (cast(tot AS double) * tot), 6) AS hhi
FROM nat ORDER BY nationkey"""


@register(
    "herfindahl_by_nation",
    oracle=_hhi_oracle(),
    tags=("concentration", "audit", "scale-pattern"),
)
def herfindahl_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nationkey, n_suppliers, hhi): revenue-share concentration of
    suppliers within each nation — squared exact cents summed in
    decimal(38,0) (hugeint on the oracle side), one broadcast dim join
    plus two map-side-combinable aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    rev = (li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
           .groupBy("s_nationkey", "l_suppkey")
           .agg(F.sum(F.floor(F.col("l_extendedprice") * 100)
                      .cast("bigint")).alias("cents")))
    nat = (rev.groupBy("s_nationkey")
           .agg(F.count(F.lit(1)).alias("n_suppliers"),
                F.sum(F.col("cents").cast("decimal(38,0)")
                      * F.col("cents")).alias("sq"),
                F.sum("cents").alias("tot")))
    return (nat.select(F.col("s_nationkey").alias("nationkey"),
                       F.col("n_suppliers").cast("long").alias("n_suppliers"),
                       F.round(F.col("sq").cast("double")
                               / (F.col("tot").cast("double")
                                  * F.col("tot")), 6).alias("hhi"))
            .orderBy("nationkey"))
