"""Window / analytic operators over the ``events`` stream table: running
aggregates, per-key ranking, lag/lead deltas, and gap-based sessionization.

Determinism note: window frames are totally ordered by (ts, event_id) — the
tiebreaker makes every frame, and therefore every cumulative double sum,
identical between Spark and DuckDB (sequential fold in frame order).

Scale notes: all of these partition by user_id — one shuffle on the partition
key, then per-partition sort. No driver-side state. Skewed users would be the
risk at 100 TB; for bounded-key analytics prefer pre-aggregated rollups, or
AQE skew handling on the sort-exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_ORDER = lambda: (F.col("ts"), F.col("event_id"))  # noqa: E731


@register(
    "window_running_total",
    oracle="""
SELECT event_id, user_id,
       cast(sum(cast(value AS decimal(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS double) AS running_value,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running_n
FROM events""",
    bench=True,
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/count per user in event-time order."""
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy(*_ORDER())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    # Decimal accumulation: DuckDB may evaluate window sums via a segment
    # tree (different addition order than Spark's running fold); exact
    # decimal makes the order irrelevant.
    return e.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
         .cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "window_topk_per_user",
    oracle="""
SELECT user_id, event_id, value, rn
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rn
      FROM events)
WHERE rn <= 3""",
    tags=("window",),
)
def window_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user — the canonical top-k-per-group:
    row_number + filter, which Spark executes with a partial sort, never a
    global one."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (e.select("user_id", "event_id", "value",
                     F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3))


@register(
    "window_event_gaps",
    oracle="""
SELECT user_id,
       count(*) AS n_gaps,
       cast(sum(gap_us) AS bigint) AS total_gap_us,
       cast(max(gap_us) AS bigint) AS max_gap_us
FROM (SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
WHERE gap_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id""",
    tags=("window",),
)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user via lag(); exact integer
    microsecond arithmetic on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    us = F.unix_micros(F.col("ts"))
    gaps = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return (gaps.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 F.sum("gap_us").alias("total_gap_us"),
                 F.max("gap_us").alias("max_gap_us"))
            .orderBy("user_id"))


@register(
    "sessionization",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
sessions AS (
  SELECT user_id, event_id, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM flagged)
SELECT user_id, cast(session_id AS bigint) AS session_id,
       count(*) AS n_events,
       cast(sum(cast(value AS decimal(18,2))) AS double) AS session_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id""",
    bench=True,
    tags=("window", "session"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag -> new-session flag
    -> running sum as session id -> per-session aggregate. This is the batch
    twin of streaming session_window (streaming/windowed.py)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id", "ts", "event_id", "value",
        F.when(gap > 1_800_000_000, 1)
         .when(F.lag("ts").over(w).isNull(), 1)
         .otherwise(0).alias("is_new"),
    )
    cum = (W.partitionBy("user_id").orderBy(*_ORDER())
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    sessions = flagged.select(
        "user_id", "event_id", "value",
        F.sum("is_new").over(cum).alias("session_id"),
    )
    return (sessions.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("session_value"))
            .orderBy("user_id", "session_id")
            .select("user_id", F.col("session_id").cast("long").alias("session_id"),
                    "n_events", "session_value"))


@register(
    "window_distribution_functions",
    oracle="""
SELECT event_type, event_id,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       lead(event_id) OVER w AS next_id,
       lag(event_id, 2) OVER w AS prev2_id
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
QUALIFY row_number() OVER w <= 15
ORDER BY event_type, pct_rank, event_id""",
    tags=("window", "distribution"),
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-function family: percent_rank / cume_dist (integer-ratio
    quotients — cross-engine-safe to round) plus lead and offset lag, over a
    totally ordered frame; first 15 rows per type."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return (
        e.select(
            "event_type", "event_id",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.lead("event_id").over(w).alias("next_id"),
            F.lag("event_id", 2).over(w).alias("prev2_id"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 15).drop("rn")
        .orderBy("event_type", "pct_rank", "event_id")
    )


@register(
    "event_path_trigrams",
    oracle="""
WITH p AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1, e2, e3, count(*) AS n
FROM p WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT 20""",
    tags=("window", "sequence", "path"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral paths: trigrams of consecutive event types per user
    in event-time order (the sequence-mining primitive behind funnel
    discovery and next-action models). One shuffle on user_id + partition
    sort for the leads; the trigram aggregate is map-side combinable over
    |types|^3 keys and the final top-k plans as TakeOrderedAndProject —
    nothing in this plan grows with user count beyond the one exchange."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    p = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    return (p.filter(F.col("e3").isNotNull())
            .groupBy("e1", "e2", "e3")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "e1", "e2", "e3")
            .limit(20))


@register(
    "event_type_transitions",
    oracle="""
WITH p AS (
  SELECT event_type AS src, lead(event_type) OVER w AS dst
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT src, dst, count(*) AS n FROM p
      WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n,
       round(n * 1.0 / cast(sum(n) OVER (PARTITION BY src) as bigint), 6)
           AS p_transition
FROM c ORDER BY src, dst""",
    tags=("window", "sequence", "markov"),
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next type | current type) with exact integer counts and a true-quotient
    probability (round 6, midpoint-safe). The normalizing window runs over
    the |types|^2 aggregate, not raw events."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    p = e.select(F.col("event_type").alias("src"),
                 F.lead("event_type").over(w).alias("dst"))
    c = (p.filter(F.col("dst").isNotNull())
         .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n")))
    return (c.select(
                "src", "dst", "n",
                F.round(F.col("n")
                        / F.sum("n").over(W.partitionBy("src")), 6)
                .alias("p_transition"))
            .orderBy("src", "dst"))


@register(
    "session_stats",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM flagged),
per AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
  FROM sessions GROUP BY user_id, session_id)
SELECT count(*) AS n_sessions,
       cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS bigint)
           AS n_bounces,
       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS bounce_rate,
       round(sum(n_events) * 1.0 / count(*), 6) AS avg_events,
       max(n_events) AS max_events,
       round(cast(sum(dur_us) AS bigint) * 1.0 / count(*) / 1000000.0, 6)
           AS avg_duration_s
FROM per""",
    tags=("window", "session"),
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level session distribution: bounce rate, events/session, and
    mean duration over the same 30-min-gap sessions as `sessionization`.
    Durations are exact integer microsecond spans (max-min epoch per
    session), so every aggregate input is an integer and the three reported
    ratios are true quotients (round 6, midpoint-safe). Three stages, each
    one shuffle: window over user partitions, per-session aggregate, then a
    single-row rollup of the (small) session table."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_ORDER())
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(gap > 1_800_000_000, 1)
         .when(F.lag("ts").over(w).isNull(), 1)
         .otherwise(0).alias("is_new"),
    )
    cum = (W.partitionBy("user_id").orderBy(*_ORDER())
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    sessions = flagged.select(
        "user_id", us.alias("us"),
        F.sum("is_new").over(cum).alias("session_id"))
    per = (sessions.groupBy("user_id", "session_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                (F.max("us") - F.min("us")).alias("dur_us")))
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.alias("n_bounces"),
        F.round(bounce / F.count(F.lit(1)), 6).alias("bounce_rate"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 6).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.sum("dur_us") / F.count(F.lit(1)) / F.lit(1000000.0), 6)
         .alias("avg_duration_s"))
