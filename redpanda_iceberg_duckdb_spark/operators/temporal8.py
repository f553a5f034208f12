"""Round-8 temporal operators: the NATIVE Spark session_window operator
replayed in batch, overlapping-interval island merging, and a FORWARD
as-of join with tolerance (the mirror of asof.py's backward join).

Scale stances:
- session_window_replay: Spark's session_window is the Structured
  Streaming session operator; in batch it compiles to one shuffle on the
  grouping key + a per-key merge — same cost envelope as the manual
  lag/cumsum sessionization (windows.py) but expressed through the engine
  operator a streaming pipeline would reuse unchanged. The oracle spells
  the merge rule explicitly: new session iff the gap STRICTLY exceeds
  the 30-min duration — an event landing exactly on the previous
  window's reported end still MERGES (pinned empirically by
  tests/test_round8_ops.py's boundary test).
- interval_islands: the classic overlap-merge. One shuffle on the
  partition key, one per-key sort; the running-max-of-ends window makes
  containment/overlap a single pass (union of an island is provably the
  contiguous [island_start, island_max_end] because every member starts
  at or before the running max end).
- asof_forward_tolerance: forward as-of == backward as-of on the NEGATED
  time axis, so it reuses asof.asof_join (union + window, one shuffle,
  no range-join explosion) with -unix_micros(ts) as the sort key; the
  tolerance is a post-filter that nulls matches beyond the horizon —
  never a join predicate, so the plan stays a single window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .asof import asof_join

_GAP_US = 1_800_000_000            # 30 min session gap
_TOL_US = 7 * 86_400_000_000       # 7-day forward tolerance


@register(
    "session_window_replay",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged)
SELECT user_id,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) + {_GAP_US} AS end_us,
       count(*) AS n_events,
       cast(sum(cast(value AS decimal(18,2))) AS double) AS session_value
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, start_us""",
    tags=("window", "session", "streaming-replay"),
)
def session_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min session windows via Spark's NATIVE session_window
    operator (the streaming session-window aggregation run on the same
    data as a batch frame) — start/end in epoch micros, end = last event
    + gap. The oracle derives identical sessions from the explicit
    gap>30min island rule (exact-boundary events merge — see module
    docstring), proving the engine operator's merge semantics."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "30 minutes").alias("sw"),
                      "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                 .cast("double").alias("session_value"))
            .select("user_id",
                    F.unix_micros("sw.start").alias("start_us"),
                    F.unix_micros("sw.end").alias("end_us"),
                    "n_events", "session_value")
            .orderBy("user_id", "start_us"))


@register(
    "interval_islands_shipping",
    oracle="""
WITH iv AS (
  SELECT l_suppkey, epoch_us(l_shipdate) AS s,
         epoch_us(l_shipdate + to_days(l_linenumber)) AS e,
         l_orderkey, l_linenumber
  FROM lineitem),
runs AS (
  SELECT l_suppkey, s, e,
         max(e) OVER (PARTITION BY l_suppkey
                      ORDER BY s, e, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_e
  FROM iv),
flagged AS (
  SELECT l_suppkey, s, e,
         CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
           AS is_new
  FROM runs),
islands AS (
  SELECT l_suppkey, s, e,
         sum(is_new) OVER (PARTITION BY l_suppkey ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island_id
  FROM flagged),
per_island AS (
  SELECT l_suppkey, island_id, count(*) AS n_iv,
         max(e) - min(s) AS span_us
  FROM islands GROUP BY l_suppkey, island_id)
SELECT l_suppkey,
       cast(sum(n_iv) AS bigint) AS n_intervals,
       cast(count(*) AS bigint) AS n_islands,
       cast(sum(span_us) AS bigint) AS covered_us,
       cast(max(span_us) AS bigint) AS max_island_us
FROM per_island GROUP BY l_suppkey ORDER BY l_suppkey""",
    tags=("temporal", "interval", "islands"),
)
def interval_islands_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap-merge of per-supplier shipping windows ([l_shipdate,
    l_shipdate + l_linenumber days] per lineitem) into maximal
    contiguous 'busy' islands; reports interval/island counts and covered
    time. A new island starts only when an interval begins STRICTLY after
    the running max end of everything before it (touching endpoints
    merge). Module docstring has the single-pass plan shape."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.unix_micros(F.col("l_shipdate"))
    e = F.unix_micros(F.expr(
        "l_shipdate + make_interval(0, 0, 0, l_linenumber, 0, 0, 0)"))
    iv = li.select("l_suppkey", s.alias("s"), e.alias("e"),
                   "l_orderkey", "l_linenumber")
    w_ord = (W.partitionBy("l_suppkey")
             .orderBy("s", "e", "l_orderkey", "l_linenumber"))
    runs = iv.withColumn(
        "prev_max_e",
        F.max("e").over(w_ord.rowsBetween(W.unboundedPreceding, -1)))
    flagged = runs.withColumn(
        "is_new",
        F.when(F.col("prev_max_e").isNull()
               | (F.col("s") > F.col("prev_max_e")), 1).otherwise(0))
    w_cum = (W.partitionBy("l_suppkey").orderBy("s", "e")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    islands = flagged.withColumn("island_id", F.sum("is_new").over(w_cum))
    per_island = (islands.groupBy("l_suppkey", "island_id")
                  .agg(F.count(F.lit(1)).alias("n_iv"),
                       (F.max("e") - F.min("s")).alias("span_us")))
    return (per_island.groupBy("l_suppkey")
            .agg(F.sum("n_iv").cast("bigint").alias("n_intervals"),
                 F.count(F.lit(1)).cast("bigint").alias("n_islands"),
                 F.sum("span_us").cast("bigint").alias("covered_us"),
                 F.max("span_us").cast("bigint").alias("max_island_us"))
            .orderBy("l_suppkey"))


@register(
    "asof_forward_tolerance",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_left
  FROM events WHERE event_type IN ('purchase', 'signup')),
w AS (
  SELECT user_id, ts, event_id, is_left,
         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, is_left, -event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS purchase_id,
         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, is_left, -event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS purchase_ts
  FROM tagged),
matched AS (
  SELECT event_id AS signup_id, user_id, ts AS signup_ts,
         purchase_id, purchase_ts,
         epoch_us(purchase_ts) - epoch_us(ts) AS gap_us
  FROM w WHERE is_left = 1)
SELECT signup_id, user_id, signup_ts,
       CASE WHEN gap_us <= {_TOL_US} THEN purchase_id END AS purchase_id,
       CASE WHEN gap_us <= {_TOL_US} THEN purchase_ts END AS purchase_ts,
       CASE WHEN gap_us <= {_TOL_US} THEN gap_us END AS gap_us
FROM matched ORDER BY signup_id""",
    tags=("asof", "join", "temporal"),
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with a 7-day tolerance: each signup matched to the
    user's NEXT purchase at or after it, nulled when the wait exceeds the
    horizon. Implemented as the backward union+window as-of join
    (asof.asof_join) on the negated microsecond axis — same single
    shuffle + window pass; ties at equal ts resolve to the SMALLER
    purchase event_id (the negated mirror of the backward join's
    larger-id rule)."""
    e = load_table(spark, sf_dir, "events")
    nts = (-F.unix_micros(F.col("ts"))).alias("nts")
    left = (e.filter(F.col("event_type") == "signup")
            .select("user_id", "ts", "event_id", nts,
                    F.col("event_id").alias("signup_id"),
                    F.col("ts").alias("signup_ts")))
    right = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", "event_id", nts,
                     (-F.col("event_id")).alias("neg_pid"),
                     F.col("event_id").alias("p_id"),
                     F.col("ts").alias("p_ts")))
    joined = asof_join(
        left, right, key="user_id", ts="nts",
        left_cols={"signup_id": "signup_id", "signup_ts": "signup_ts"},
        right_cols={"neg_pid": "neg_pid", "p_id": "p_id", "p_ts": "p_ts"},
    )
    gap = F.unix_micros("p_ts") - F.unix_micros("signup_ts")
    ok = F.col("p_ts").isNotNull() & (gap <= _TOL_US)
    return (joined.select(
        "signup_id", F.col("user_id").cast("long").alias("user_id"),
        "signup_ts",
        F.when(ok, F.col("p_id")).alias("purchase_id"),
        F.when(ok, F.col("p_ts")).alias("purchase_ts"),
        F.when(ok, gap).alias("gap_us"))
        .orderBy("signup_id"))
