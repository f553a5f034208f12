"""Item-item collaborative filtering (Sarwar et al., WWW 2001; the
Amazon item-to-item scheme) over the purchase graph: parts are similar
when the same customers buy them, scored by co-occurrence cosine
c_ij / sqrt(pop_i * pop_j), reported as top-3 neighbors for a fixed
probe set of parts.

Scale. The quadratic danger is the per-customer pair explosion (a
customer with B parts emits B^2 pairs), the exact analogue of the LSH
df-cap skew guard: baskets are CAPPED at 30 parts (deterministic keep =
lowest partkeys) BEFORE pairing, so the co-occurrence join is bounded
per customer and popularity/cosine are defined consistently on the
capped baskets. Pair generation is one self-equi-join on custkey
(co-partitioned), ranking is a per-item window.

Exactness: counts are exact; cosine = c / sqrt(pop_i * pop_j) uses one
IEEE-exact sqrt of an integer product and is rounded to 6 BEFORE the
rank ordering (ties then break on neighbor key), the similarity.py
discipline, so both engines rank identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_CAP = 30
_TOPK = 3
_PROBES = (0, 1, 2, 3, 4)


def _oracle() -> str:
    probes = ", ".join(str(p) for p in _PROBES)
    return f"""
WITH raw AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
capped AS (
  SELECT c, p FROM (
    SELECT c, p, row_number() OVER (PARTITION BY c ORDER BY p) AS rn
    FROM raw) WHERE rn <= {_CAP}),
pop AS (SELECT p, count(*) AS pop FROM capped GROUP BY p),
co AS (
  SELECT a.p AS i, b.p AS j, count(*) AS c
  FROM capped a JOIN capped b ON b.c = a.c AND b.p <> a.p
  GROUP BY a.p, b.p),
scored AS (
  SELECT co.i, co.j, co.c,
         round(co.c / sqrt(cast(pi.pop AS double) * pj.pop), 6) AS cosine
  FROM co JOIN pop pi ON pi.p = co.i JOIN pop pj ON pj.p = co.j),
ranked AS (
  SELECT i, j, c, cosine,
         row_number() OVER (PARTITION BY i
                            ORDER BY cosine DESC, j) AS rank
  FROM scored WHERE i IN ({probes}))
SELECT cast(i AS bigint) AS probe_part, cast(rank AS int) AS rank,
       cast(j AS bigint) AS similar_part, cast(c AS bigint) AS co_count,
       cosine
FROM ranked WHERE rank <= {_TOPK} ORDER BY probe_part, rank"""


@register(
    "item_item_cosine_recs",
    oracle=_oracle(),
    tags=("recommendation", "similarity", "scale-pattern"),
)
def item_item_cosine_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(probe_part, rank, similar_part, co_count, cosine): top-3
    item-item CF neighbors for the fixed probe parts, capped-basket
    co-occurrence cosine (module docstring)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
           .select(F.col("o_custkey").alias("c"),
                   F.col("l_partkey").alias("p"))
           .distinct())
    wc = W.partitionBy("c").orderBy("p")
    capped = (raw.withColumn("rn", F.row_number().over(wc))
              .filter(F.col("rn") <= _CAP).select("c", "p"))
    pop = capped.groupBy("p").agg(F.count(F.lit(1)).alias("pop"))
    a = capped.select("c", F.col("p").alias("i"))
    b = capped.select("c", F.col("p").alias("j"))
    co = (a.join(b, "c").filter(F.col("i") != F.col("j"))
          .groupBy("i", "j").agg(F.count(F.lit(1)).alias("co")))
    probes = co.filter(F.col("i").isin(*_PROBES))
    scored = (probes
              .join(F.broadcast(pop.select(F.col("p").alias("i"),
                                           F.col("pop").alias("pi"))), "i")
              .join(F.broadcast(pop.select(F.col("p").alias("j"),
                                           F.col("pop").alias("pj"))), "j")
              .select("i", "j", "co",
                      F.round(F.col("co") / F.sqrt(
                          F.col("pi").cast("double") * F.col("pj")), 6)
                      .alias("cosine")))
    wr = W.partitionBy("i").orderBy(F.desc("cosine"), F.asc("j"))
    return (scored.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= _TOPK)
            .select(F.col("i").cast("long").alias("probe_part"),
                    F.col("rank").cast("int").alias("rank"),
                    F.col("j").cast("long").alias("similar_part"),
                    F.col("co").cast("long").alias("co_count"),
                    "cosine")
            .orderBy("probe_part", "rank"))
