"""Pareto-frontier (skyline) operator — an operator DuckDB/Spark both lack
natively, composed scale-first from bucketed pruning + a tiny exact verify.

The skyline of `part` under (minimize p_retailprice, maximize p_size):
a part is ON the frontier iff no other part has price <= AND size >= it
with at least one strict. The naive plan is the O(N²) dominance self-join;
at 100 TB that's not a plan. This implementation uses the classic
bucket-prune-verify decomposition:

1. Bucket parts by a fixed price grid (floor(price/100) — data-independent,
   no global sort). Every part in a strictly lower bucket has strictly
   lower price, so it dominates anything in a higher bucket with <= size.
2. Per-bucket max size (one map-side-combinable aggregate), then a running
   max over the bucket table ORDERED BY bucket — a window over O(#buckets)
   rows, KBs, irrelevant at any scale.
3. Prune: a part survives only if its size strictly exceeds the running
   max of all lower buckets (otherwise some strictly-cheaper part has >=
   size -> dominated). This is a broadcast join of the tiny bucket-stats
   table onto the scan — the 100 TB pass is ONE scan + one broadcast.
4. Exact dominance anti-join over the SURVIVORS only. Survivor count is
   bounded by (#buckets x per-bucket frontier width) — small by
   construction, so the inequality-condition nested-loop join the anti
   semantics require runs on a frame that fits broadcast.

The oracle is the O(N²) NOT EXISTS formulation — agreement proves the
prune lost nothing (exactly the setsim.py PPJoin proof pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_BUCKET_WIDTH = 100.0


def pareto_frontier(df: DataFrame, price: str, size: str,
                    bucket_width: float = _BUCKET_WIDTH) -> DataFrame:
    """Rows of ``df`` on the (minimize price, maximize size) Pareto
    frontier via bucket-prune-verify (module docstring). Generic over any
    frame — tested against the brute-force dominance definition on
    adversarial synthetic inputs in tests/test_round8_ops.py."""
    b = df.withColumn("_bucket", F.floor(F.col(price) / bucket_width))
    bstats = (b.groupBy("_bucket").agg(F.max(size).alias("_bmax"))
              .withColumn("_prior_max", F.max("_bmax").over(
                  W.orderBy("_bucket")
                  .rowsBetween(W.unboundedPreceding, -1))))
    survivors = (b.join(F.broadcast(bstats.select("_bucket", "_prior_max")),
                        "_bucket")
                 .filter(F.col("_prior_max").isNull()
                         | (F.col(size) > F.col("_prior_max")))
                 .drop("_bucket", "_prior_max")
                 .localCheckpoint(eager=True))  # both sides of the verify
    d = survivors.select(F.col(price).alias("_d_price"),
                         F.col(size).alias("_d_size"))
    dominated = ((F.col("_d_price") <= F.col(price))
                 & (F.col("_d_size") >= F.col(size))
                 & ((F.col("_d_price") < F.col(price))
                    | (F.col("_d_size") > F.col(size))))
    return survivors.join(F.broadcast(d), dominated, "left_anti")


@register(
    "pareto_frontier_parts",
    oracle="""
SELECT p_partkey, p_retailprice, cast(p_size AS bigint) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
ORDER BY p_partkey""",
    tags=("frontier", "skyline", "scale-pattern"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (min price, max size) Pareto frontier — the
    bucket-prune-verify skyline; module docstring has the decomposition
    and why step 4's nested-loop join is safe."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size")
    return (pareto_frontier(p, "p_retailprice", "p_size")
            .select("p_partkey", "p_retailprice",
                    F.col("p_size").cast("bigint").alias("p_size"))
            .orderBy("p_partkey"))
