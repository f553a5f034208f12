"""Incremental rollup maintenance (materialized-view delta refresh): merge a
previously materialized aggregate with partials from newly arrived data
instead of rescanning history — at 100 TB the difference between an hourly
job that reads one hour and one that reads three years.

The mergeability trap this module demonstrates: COUNT/SUM/MIN/MAX merge from
(key -> partial) state directly, but COUNT(DISTINCT user) does NOT — merged
distinct counts need either per-(key, user) partials (exact, done here: the
state table keeps user granularity, final distinct count = row count per
key) or a mergeable sketch (HLL — see operators/sketches.py). Keeping the
partial SUM in decimal (not double) until the final cast is what makes the
incremental result bit-identical to the full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import dsum_sql
from ..registry import register
from ..tables import load_table

_DEC = "decimal(18,2)"
# Everything before the cutoff plays the "already materialized" state; the
# tail is the newly arrived partition being folded in.
_CUTOFF = "2024-01-28 00:00:00"


def partial_rollup(events: DataFrame) -> DataFrame:
    """Mergeable partial state at (hour, event_type, user_id) granularity.
    SUM stays decimal so later merges add exactly."""
    return (events.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                           "event_type", "user_id")
            .agg(F.count(F.lit(1)).alias("pn"),
                 F.sum(F.col("value").cast(_DEC)).alias("ptotal")))


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Fold any number of partial-state tables into the final rollup:
    partials re-aggregate by key (sums of counts/sums), and the exact
    distinct-user count falls out as the number of (user) partial rows per
    key. One shuffle on the rollup key regardless of how many deltas."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    by_user = (merged.groupBy("hour", "event_type", "user_id")
               .agg(F.sum("pn").alias("pn"), F.sum("ptotal").alias("ptotal")))
    return (by_user.groupBy("hour", "event_type")
            .agg(F.sum("pn").alias("n"),
                 F.sum("ptotal").cast("double").alias("total_value"),
                 F.count(F.lit(1)).alias("n_users"))
            .orderBy("hour", "event_type"))


@register(
    "events_hourly_incremental",
    oracle=f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, {dsum_sql("value", "total_value")},
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY hour, event_type
ORDER BY hour, event_type""",
    bench=True,
    tags=("incremental", "grouping"),
)
def events_hourly_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-refresh of the events_hourly rollup: history (before the
    2024-01-28 cutoff) is aggregated once into mergeable partial state, the
    new tail partition is aggregated separately, and the two states merge —
    the oracle is the FULL recompute over all events, proving incremental
    == full to the hash. In production the history partial is a stored
    table and only the tail scan runs per refresh."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    old_state = partial_rollup(e.filter(F.col("ts") < cutoff))
    new_state = partial_rollup(e.filter(F.col("ts") >= cutoff))
    return merge_rollups(old_state, new_state)
