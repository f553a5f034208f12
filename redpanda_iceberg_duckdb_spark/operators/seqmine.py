"""First-occurrence precedence mining — the support table behind
sequential-pattern discovery (the length-2 core of PrefixSpan, Pei et
al., ICDE 2001): for every ordered pair of event types (a -> b), how many
users saw their first `a` strictly before their first `b`?

Unlike `event_type_transitions` (adjacent Markov steps) or the funnels
(one fixed sequence), this measures non-contiguous precedence across ALL
type pairs — the table a growth team reads to discover which orderings
exist before wiring any specific funnel.

Scale stance: events collapse to one row per (user, type) via a single
hash aggregate (min ts), so the self-join that forms pairs runs on
user-cardinality input co-partitioned by user_id — per-user blowup is
bounded by #types^2 (25 here), never by event count. Equal first-times
count in NEITHER direction (strict <), making the result independent of
any within-timestamp ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table


def _oracle() -> str:
    return """
WITH firsts AS (
  SELECT user_id, event_type, min(ts) AS fts
  FROM events GROUP BY user_id, event_type)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       cast(count(*) AS bigint) AS n_users_both,
       cast(count(*) FILTER (WHERE a.fts < b.fts) AS bigint)
         AS n_a_before_b,
       round(cast(count(*) FILTER (WHERE a.fts < b.fts) AS double)
             / count(*), 4) AS support
FROM firsts a JOIN firsts b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b"""


@register(
    "event_precedence_support",
    oracle=_oracle(),
    tags=("sequence", "mining", "scale-pattern"),
)
def event_precedence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per unordered type pair (a < b lexically): users having both, users
    whose first `a` strictly preceded their first `b`, and the precedence
    support ratio. One min-ts aggregate, one co-partitioned self-join on
    user_id with type-bounded fanout."""
    firsts = (load_table(spark, sf_dir, "events")
              .groupBy("user_id", "event_type")
              .agg(F.min("ts").alias("fts")))
    a = firsts.select(F.col("user_id"),
                      F.col("event_type").alias("type_a"),
                      F.col("fts").alias("fts_a"))
    b = firsts.select(F.col("user_id"),
                      F.col("event_type").alias("type_b"),
                      F.col("fts").alias("fts_b"))
    return (a.join(b, (a.user_id == b.user_id)
                   & (F.col("type_a") < F.col("type_b")))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users_both"),
                 F.count_if(F.col("fts_a") < F.col("fts_b")).cast("long")
                 .alias("n_a_before_b"))
            .withColumn("support",
                        F.round(F.col("n_a_before_b").cast("double")
                                / F.col("n_users_both"), 4))
            .orderBy("type_a", "type_b"))
