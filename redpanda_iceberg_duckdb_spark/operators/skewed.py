"""Hot-key (skewed) join as a registered correctness query.

The bench demo (bench.py skew_join_demo) measures the salted-join win on a
synthetic hot key; this module registers the same join SHAPE as a
driver-checkable query with a DuckDB oracle, so skew handling has a
correctness row, not just a timing (VERDICT round-2 task #7).

Scale stance: 95% of fact rows share one derived key. The optimizer's first
defense is broadcasting the 1000-row dim (no shuffle of the fact at all —
skew on the probe side of a broadcast join is harmless because no
partitioning by key ever happens). When the build side is too big to
broadcast, AQE's skew-join split is the fallback;
tests/test_plans.py::test_skew_hot_key_join_aqe_split forces that regime
(broadcast off, tiny skew thresholds) and asserts the split actually fires
in the executed plan. Explicit salting (functions/skew.py) remains for
streaming joins where AQE is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import dsum, dsum_sql
from ..registry import register
from ..tables import load_table


def hot_key_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem projected to a deliberately skewed join key: 95% of rows
    collapse onto k=0, the rest scatter over k in [0, 1000)."""
    li = load_table(spark, sf_dir, "lineitem")
    k = (F.when(F.pmod("l_orderkey", 100) < 95, F.lit(0))
         .otherwise(F.pmod("l_orderkey", 1000))).cast("long")
    return li.select(k.alias("k"), "l_extendedprice")


def weight_dim(spark: SparkSession) -> DataFrame:
    """1000-row keyed dim (k, w) — broadcast-sized by construction."""
    return spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w"))


@register(
    "skew_hot_key_join",
    oracle=f"""
WITH big AS (
  SELECT CASE WHEN l_orderkey % 100 < 95 THEN 0
              ELSE l_orderkey % 1000 END AS k,
         l_extendedprice
  FROM lineitem),
dim AS (SELECT range AS k, range % 7 + 1 AS w FROM range(1000))
SELECT w, count(*) AS n, {dsum_sql("l_extendedprice", "s")}
FROM big JOIN dim USING (k)
GROUP BY w ORDER BY w""",
    tags=("join", "skew"),
)
def skew_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the hot-keyed fact to the weight dim and aggregate per weight
    class: the canonical skewed-join shape. Left declarative so Catalyst
    broadcasts the dim (the right plan); the AQE-skew-split fallback for the
    non-broadcastable regime is pinned by tests/test_plans.py."""
    big = hot_key_fact(spark, sf_dir)
    dim = weight_dim(spark)
    return (big.join(dim, "k")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "s"))
            .orderBy("w"))
