"""Bucketed range join — the scale answer to pure range predicates.

A join whose ONLY predicate is a range (|t1 - t2| <= delta, lo <= x <= hi)
gives Catalyst nothing to hash on: the plan degenerates to
BroadcastNestedLoopJoin / CartesianProduct, O(N*M) comparisons — the classic
cluster-killer. The fix (what Databricks' range-join optimization does under
the hood): quantize the range column into buckets of the range width, explode
ONE side into the buckets its window can touch (3 for a +/-delta window),
equi-join on the bucket, then re-check the exact predicate. Cost becomes
O(3*N + matches) through a hash join, and every stage is
shuffle-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_DELTA_S = 600  # +/- 10 minutes


def bucketed_range_join(left: DataFrame, right: DataFrame, *,
                        left_ts: str, right_ts: str,
                        delta_s: int) -> DataFrame:
    """Equi-joinable form of ``|left_ts - right_ts| <= delta_s``: both sides
    bucket at delta_s granularity; the left side explodes to its bucket and
    both neighbors (any right row within delta_s lives in one of those
    three); the exact predicate filters after the hash join."""
    lb = (left.withColumn(
        "_b", F.explode(F.array(*[
            (F.floor(F.unix_timestamp(F.col(left_ts)) / delta_s) + i)
            for i in (-1, 0, 1)]))))
    rb = right.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(right_ts)) / delta_s))
    return (lb.join(rb, "_b")
            .filter(F.abs(F.unix_timestamp(F.col(left_ts))
                          - F.unix_timestamp(F.col(right_ts))) <= delta_s)
            .drop("_b"))


@register(
    "range_join_error_proximity",
    oracle=f"""
SELECT p.event_id AS purchase_id,
       count(*) AS n_nearby_errors,
       min(e.event_id) AS first_error_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON abs(epoch(p.ts) - epoch(e.ts)) <= {_DELTA_S}
GROUP BY p.event_id
ORDER BY purchase_id""",
    tags=("join", "range"),
)
def range_join_error_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within +/-10 minutes of each purchase (incident-correlation
    shape), via the bucketed range join: NO nested-loop scan appears in the
    plan (asserted in tests/test_plans.py) even though the join predicate
    is a pure time range — at 2000x2000 rows nested-loop is survivable, at
    100 TB it is not. Dedup of the 3-bucket explosion happens naturally in
    the aggregate (each (purchase, error) pair matches in exactly one of
    the error's buckets, since the error's single bucket is covered once
    by the purchase's 3-bucket window)."""
    e = load_table(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts")))
    errors = (e.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"),
                      F.col("ts").alias("e_ts")))
    joined = bucketed_range_join(purchases, errors,
                                 left_ts="p_ts", right_ts="e_ts",
                                 delta_s=_DELTA_S)
    return (joined.groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n_nearby_errors"),
                 F.min("error_id").alias("first_error_id"))
            .orderBy("purchase_id"))
