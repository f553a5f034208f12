"""Truncated Katz centrality on the rare-part co-purchase graph —
the walk-counting centrality between degree (graph_degree_stats) and
the eigenvector family (pagerank, HITS) the engine already carries.

Katz(v) = sum_{k=1..4} alpha^k * walks_k(v) with alpha = 1/10, where
walks_k(v) counts length-k walks ENDING at v from any start node.
Truncation at 4 hops is declared semantics (the bounded-hop convention
double_sweep_diameter and sssp_cheapest_paths use), and alpha = 1/10
makes the score an EXACT integer on the 1e4 lattice:

    katz_e4(v) = 1000*w1 + 100*w2 + 10*w3 + w4

— walk counts are exact bigints (w_{k}(v) = sum over in-neighbors u of
w_{k-1}(u), w_0 = 1), so both engines agree bit-for-bit with zero float
work. Overflow bound: w4 <= max_deg^4; at the rare-part cap (degree <=
~25 co-purchasers per part times basket fan-out) w4 stays far inside
int64 for any SF — the cap is the same skew guard the whole graph
family rides.

Reuses the memoized checkpointed edge cache (graph10d.copurchase_edges).

Scale stance (100 TB): 4 co-partitioned equi-join + partial-agg rounds
over the shared edge list (the pagerank shuffle shape, fixed depth, no
convergence loop); output is a top-20 TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .graph10d import _edges_sql, copurchase_edges

_K = 4
_TOPN = 20

_KATZ_ORACLE = f"""
WITH {_edges_sql()},
nodes AS (SELECT DISTINCT src AS v FROM e),
w1 AS MATERIALIZED (
  SELECT e.dst AS v, cast(count(*) AS bigint) AS w
  FROM e GROUP BY e.dst),
w2 AS MATERIALIZED (
  SELECT e.dst AS v, cast(sum(w1.w) AS bigint) AS w
  FROM e JOIN w1 ON w1.v = e.src GROUP BY e.dst),
w3 AS MATERIALIZED (
  SELECT e.dst AS v, cast(sum(w2.w) AS bigint) AS w
  FROM e JOIN w2 ON w2.v = e.src GROUP BY e.dst),
w4 AS MATERIALIZED (
  SELECT e.dst AS v, cast(sum(w3.w) AS bigint) AS w
  FROM e JOIN w3 ON w3.v = e.src GROUP BY e.dst)
SELECT n.v AS node,
       coalesce(w1.w, 0) AS w1,
       coalesce(w2.w, 0) AS w2,
       coalesce(w3.w, 0) AS w3,
       coalesce(w4.w, 0) AS w4,
       1000 * coalesce(w1.w, 0) + 100 * coalesce(w2.w, 0)
         + 10 * coalesce(w3.w, 0) + coalesce(w4.w, 0) AS katz_e4
FROM nodes n
LEFT JOIN w1 ON w1.v = n.v
LEFT JOIN w2 ON w2.v = n.v
LEFT JOIN w3 ON w3.v = n.v
LEFT JOIN w4 ON w4.v = n.v
ORDER BY katz_e4 DESC, node LIMIT {_TOPN}"""


@register(
    "katz_centrality_4hop",
    oracle=_KATZ_ORACLE,
    tags=("graph", "centrality", "scale-pattern"),
)
def katz_centrality_4hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by 4-hop truncated Katz centrality on the exact
    integer 1e4-lattice (module docstring): one keyed join + partial
    aggregate per hop over the shared checkpointed co-purchase edges."""
    edges = copurchase_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("v")).distinct()
    walks = [edges.groupBy(F.col("dst").alias("v"))
             .agg(F.count(F.lit(1)).cast("long").alias("w"))]
    for _ in range(2, _K + 1):
        prev = walks[-1].select(F.col("v").alias("src"),
                                F.col("w").alias("pw"))
        walks.append(edges.join(prev, "src")
                     .groupBy(F.col("dst").alias("v"))
                     .agg(F.sum("pw").cast("long").alias("w")))
    out = nodes
    for k, wk in enumerate(walks, start=1):
        out = out.join(wk.select("v", F.col("w").alias(f"w{k}")), "v",
                       "left")
    out = out.select(
        F.col("v").alias("node"),
        *[F.coalesce(f"w{k}", F.lit(0)).alias(f"w{k}")
          for k in range(1, _K + 1)])
    katz = (F.lit(1000) * F.col("w1") + F.lit(100) * F.col("w2")
            + F.lit(10) * F.col("w3") + F.col("w4"))
    return (out.withColumn("katz_e4", katz)
            .orderBy(F.col("katz_e4").desc(), "node").limit(_TOPN))
