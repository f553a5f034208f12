"""Landmark BFS hop histogram and HITS hubs/authorities (Kleinberg,
JACM 1999) — completing the graph tier beside degree stats, triangles,
PageRank, and connected components.

BFS. The customer co-purchase graph: an edge joins two customers who
share a RARE part (capped basket popularity <= 25 buyers — the PPJoin
rare-token discipline that keeps the pair join from exploding on hub
parts; exactly the skew guard a 100 TB co-occurrence graph needs). From
the landmark (smallest customer id in the graph) the hop distance is
computed by k=4 rounds of frontier expansion — each round ONE
co-partitioned join + an anti-join against the visited set, the
monotone-label pattern of clusters.py; no driver-side collect anywhere.
The oracle is a recursive CTE walking the same edges with the same hop
cap. Output: customers per hop 0..4, unreachable as hop -1.

HITS. On the bipartite customer->part purchase graph, two mutually
recursive iterations: authority(part) = sum of buyer hub scores,
hub(customer) = sum of bought authority scores. With unit
initialization the iterates stay EXACT INTEGERS (a1 = in-degree,
h1 = sum a1, a2 = sum h1, h2 = sum a2) — no per-step normalization, so
there is no floating aggregation at all and both engines agree bit for
bit; int64 headroom holds to ~sf10 (score growth is bounded by
(max degree)^k, documented here rather than discovered at 2 a.m.).
Each half-step is one co-partitioned join + one map-side-combinable
aggregate. Output: top-10 hubs and top-10 authorities by exact score."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_POP_CAP = 25    # BFS: only parts with <= this many buyers create edges
_HOPS = 4
_TOPK = 10


def _baskets_sql() -> str:
    return """
baskets AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)"""


def _bfs_oracle() -> str:
    return f"""
WITH RECURSIVE {_baskets_sql()},
rare AS (
  SELECT p FROM baskets GROUP BY p HAVING count(*) <= {_POP_CAP}),
e AS (
  SELECT DISTINCT a.c AS src, b.c AS dst
  FROM baskets a JOIN rare r ON r.p = a.p
  JOIN baskets b ON b.p = a.p AND b.c <> a.c),
nodes AS (SELECT DISTINCT c FROM baskets),
lm AS (SELECT min(src) AS c FROM e),
walk(node, d) AS (
  SELECT c, 0 FROM lm
  UNION
  SELECT e.dst, walk.d + 1 FROM walk JOIN e ON e.src = walk.node
  WHERE walk.d < {_HOPS}),
dist AS (SELECT node, min(d) AS d FROM walk GROUP BY node)
SELECT coalesce(d.d, -1) AS hops,
       cast(count(*) AS bigint) AS n_customers
FROM nodes n LEFT JOIN dist d ON d.node = n.c
GROUP BY 1 ORDER BY 1"""


@register(
    "bfs_hop_distance",
    oracle=_bfs_oracle(),
    tags=("graph", "iterative", "scale-pattern"),
)
def bfs_hop_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hops, n_customers): BFS hop histogram from the landmark customer
    over the rare-part co-purchase graph, k=4 frontier-join rounds,
    unreachable = -1 (module docstring)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
               .select(F.col("o_custkey").alias("c"),
                       F.col("l_partkey").alias("p"))
               .distinct())
    # same edge spec as graph10d.copurchase_edges (pop cap _POP_CAP):
    # memoized per (application, dataset) since k-core and LPA iterate
    # over the identical graph — the ~6 s build is paid once per dataset.
    from ..dataset_cache import data_fingerprint
    from ..session import iterate_partitions, pinned_shuffle_partitions
    from .graph10d import copurchase_edges, copurchase_vertex_count
    from .graph_iterate import iterate_join_strategy

    # r16 (verdict item 2): the r15 broadcast hints on the O(V)
    # frontier/visited iterates are gated on the measured vertex count;
    # above the gate the edge table is hash-partitioned by src once
    # (pay-once layout, guide §2.4) and the per-hop joins shuffle only
    # the iterate side — the fallback the r15 comments promised.
    edges, hint = iterate_join_strategy(
        spark, copurchase_edges(spark, sf_dir), "src",
        copurchase_vertex_count(spark, sf_dir),
        ("copurchase", data_fingerprint(sf_dir, "orders", "lineitem")
         or sf_dir))

    nodes = baskets.select("c").distinct()
    lm = edges.agg(F.min("src").alias("lmc"))
    dist = (nodes.join(F.broadcast(lm), nodes["c"] == F.col("lmc"))
            .select("c", F.lit(0).alias("d")))
    frontier = dist
    # r15 optimization (guide §2.2): frontier/visited frames are O(V)
    # iterates — run the 4 hop rounds at the loop shuffle width
    # (session.iterate_partitions, scale-adaptive) instead of full
    # session width per rung. Measured at sf0.1/local[32] (warm edge
    # cache): 2.9 -> 1.4 s.
    with pinned_shuffle_partitions(spark, iterate_partitions(spark)):
        for k in range(1, _HOPS + 1):
            nxt = (edges.join(hint(frontier),
                              frontier["c"] == edges["src"])
                   .select(F.col("dst").alias("c")).distinct()
                   .join(hint(dist.select("c")), "c", "left_anti")
                   .withColumn("d", F.lit(k)))
            nxt = nxt.localCheckpoint()  # bound the iterative plan depth
            dist = dist.union(nxt)
            frontier = nxt
    return (nodes.join(dist, "c", "left")
            .select(F.coalesce("d", F.lit(-1)).alias("hops"))
            .groupBy("hops")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
            .orderBy("hops"))


def _hits_oracle() -> str:
    return f"""
WITH {_baskets_sql()},
a1 AS (SELECT p, cast(count(*) AS bigint) AS s FROM baskets GROUP BY p),
h1 AS (SELECT b.c, sum(a1.s) AS s FROM baskets b
       JOIN a1 ON a1.p = b.p GROUP BY b.c),
a2 AS (SELECT b.p, sum(h1.s) AS s FROM baskets b
       JOIN h1 ON h1.c = b.c GROUP BY b.p),
h2 AS (SELECT b.c, sum(a2.s) AS s FROM baskets b
       JOIN a2 ON a2.p = b.p GROUP BY b.c),
th AS (SELECT 'hub' AS role, c AS node_id, s,
              row_number() OVER (ORDER BY s DESC, c) AS rank FROM h2),
ta AS (SELECT 'authority' AS role, p AS node_id, s,
              row_number() OVER (ORDER BY s DESC, p) AS rank FROM a2)
SELECT role, cast(rank AS int) AS rank, cast(node_id AS bigint) AS node_id,
       cast(s AS bigint) AS score
FROM (SELECT * FROM th WHERE rank <= {_TOPK}
      UNION ALL SELECT * FROM ta WHERE rank <= {_TOPK})
ORDER BY role, rank"""


@register(
    "hits_hubs_authorities",
    oracle=_hits_oracle(),
    tags=("graph", "iterative"),
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(role, rank, node_id, score): top-10 HITS hubs (customers) and
    authorities (parts) after two exact-integer mutual-recursion steps
    on the purchase bipartite graph (module docstring)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
               .select(F.col("o_custkey").alias("c"),
                       F.col("l_partkey").alias("p"))
               .distinct().localCheckpoint())  # reused by all four steps
    a1 = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    h1 = (baskets.join(a1, "p")
          .groupBy("c").agg(F.sum("s").alias("s")))
    a2 = (baskets.join(h1, "c")
          .groupBy("p").agg(F.sum("s").alias("s")))
    h2 = (baskets.join(a2, "p")
          .groupBy("c").agg(F.sum("s").alias("s")))
    # Distributed top-k first (TakeOrderedAndProject), THEN rank the
    # k survivors with a window — never a global row_number.
    wh = W.orderBy(F.desc("s"), F.asc("node_id"))
    th = (h2.select(F.lit("hub").alias("role"),
                    F.col("c").alias("node_id"), "s")
          .orderBy(F.desc("s"), F.asc("node_id")).limit(_TOPK)
          .withColumn("rank", F.row_number().over(wh)))
    ta = (a2.select(F.lit("authority").alias("role"),
                    F.col("p").alias("node_id"), "s")
          .orderBy(F.desc("s"), F.asc("node_id")).limit(_TOPK)
          .withColumn("rank", F.row_number().over(wh)))
    return (th.union(ta)
            .select("role", F.col("rank").cast("int").alias("rank"),
                    F.col("node_id").cast("long").alias("node_id"),
                    F.col("s").cast("long").alias("score"))
            .orderBy("role", "rank"))
