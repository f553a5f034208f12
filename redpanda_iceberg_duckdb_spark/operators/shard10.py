"""Rendezvous (highest-random-weight) hashing shard audit (Thaler &
Ravishankar 1996; the consistent-placement rule behind cache rings and
shard maps) — the data-placement operator a 100 TB pipeline needs when
the shard count changes: HRW guarantees that adding shard m+1 moves
EXACTLY the keys the new shard wins and nothing else, so a resharding
touches ~n/(m+1) keys instead of nearly all of them (mod-hashing's
failure mode).

weight(key, shard) = the cross-engine md5 uint64 (functions/hashing.py)
of 'hrw:<shard>:<key>'; a key lives on its argmax shard. Both the m = 8
and the m = 9 assignments come out of ONE pass: explode each key over the
9 candidate shards, take two struct-maxes (one over shards < 8, one over
all) — 64-bit weights on distinct inputs never tie, so the argmax is
deterministic without a tie-break column. The output is the per-shard key
count under both maps side by side; the minimal-disruption theorem is
VISIBLE in it (every shard 0-7 has n_keys_9 <= n_keys_8, and the moved
mass equals shard 8's n_keys_9 — the planted test asserts the set
identity, the registered query shows the balance).

At 100 TB: one distinct-key scan, an m+1-way row explode (constant
factor), one combinable max-struct aggregate per key, one count per
shard. No shuffle beyond the key distinct and the final tiny rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from ..functions.hashing import md5_u64_duck, md5_u64_spark

_M = 8   # baseline shard count; the audit adds shard _M as the 9th


def _oracle() -> str:
    w = md5_u64_duck("'hrw:' || s.s || ':' || k.user_id")
    return f"""
WITH k AS (SELECT DISTINCT user_id FROM events),
s AS (SELECT unnest(generate_series(0, {_M})) AS s),
wt AS (
  SELECT k.user_id, s.s, {w} AS w FROM k, s),
am AS (
  SELECT user_id,
         arg_max(s, w) FILTER (WHERE s < {_M}) AS shard8,
         arg_max(s, w) AS shard9
  FROM wt GROUP BY 1),
c8 AS (SELECT shard8 AS shard, count(*) AS n_keys_8 FROM am GROUP BY 1),
c9 AS (SELECT shard9 AS shard, count(*) AS n_keys_9 FROM am GROUP BY 1)
SELECT s.s AS shard,
       cast(coalesce(c8.n_keys_8, 0) AS bigint) AS n_keys_8,
       cast(coalesce(c9.n_keys_9, 0) AS bigint) AS n_keys_9
FROM s LEFT JOIN c8 ON c8.shard = s.s LEFT JOIN c9 ON c9.shard = s.s
ORDER BY shard"""


@register(
    "rendezvous_shard_audit",
    oracle=_oracle(),
    tags=("systems", "placement", "scale-pattern"),
)
def rendezvous_shard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_keys_8, n_keys_9): per-shard key counts under the 8-shard
    and 9-shard HRW maps from one pass — shard 8's n_keys_9 IS the moved
    mass, every other shard only shrinks (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    k = e.select("user_id").distinct()
    shards = spark.range(_M + 1).select(F.col("id").cast("int").alias("s"))
    wt = (k.crossJoin(F.broadcast(shards))
          .withColumn("w", F.expr(md5_u64_spark(
              "concat('hrw:', s, ':', user_id)"))))
    am = (wt.groupBy("user_id")
          .agg(F.max(F.when(F.col("s") < _M,
                            F.struct(F.col("w"), F.col("s"))))["s"]
               .alias("shard8"),
               F.max(F.struct(F.col("w"), F.col("s")))["s"]
               .alias("shard9")))
    c8 = am.groupBy(F.col("shard8").alias("shard")) \
        .agg(F.count(F.lit(1)).alias("n_keys_8"))
    c9 = am.groupBy(F.col("shard9").alias("shard")) \
        .agg(F.count(F.lit(1)).alias("n_keys_9"))
    return (shards.withColumnRenamed("s", "shard")
            .join(F.broadcast(c8), "shard", "left")
            .join(F.broadcast(c9), "shard", "left")
            .select("shard",
                    F.coalesce("n_keys_8", F.lit(0)).cast("long")
                    .alias("n_keys_8"),
                    F.coalesce("n_keys_9", F.lit(0)).cast("long")
                    .alias("n_keys_9"))
            .orderBy("shard"))
