"""Streaming funnel maintenance, driver-checkable: the ordered
view->click->purchase funnel (events12.py) maintained INCREMENTALLY
across 4 event-time batches through the real per-micro-batch transform
(streaming/funnel_sink.merge_funnel), funnel counts emitted after every
batch. The oracle recomputes the funnel from scratch at each cutoff, so
a green row proves the 3-timestamp state is a sufficient statistic under
event-time-ordered delivery — the maintained funnel never drifts from
the true one, batch after batch (the ivm_stream equality, funnel
edition).

Batching: fixed timeline cuts (state starts empty; batch i delivers
events with ts in [T_{i-1}, T_i), last batch unbounded) — the same
deterministic chunking the state-metrics replay uses, and the ordering
regime under which the sink's docstring proves exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..streaming.funnel_sink import empty_funnel_state, funnel_counts, \
    merge_funnel
from ..tables import load_table

_CUTS = ["2024-01-08", "2024-01-16", "2024-01-24"]


def _bounds() -> list[tuple[str | None, str | None]]:
    lows = [None] + _CUTS
    highs = _CUTS + [None]
    return list(zip(lows, highs))


def _oracle() -> str:
    parts = []
    for i, (_lo, hi) in enumerate(_bounds(), 1):
        w = f"AND ts < TIMESTAMP '{hi}'" if hi else ""
        parts.append(f"""
SELECT {i} AS batch_id, * FROM (
  WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' {w} GROUP BY user_id),
  c AS (SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1 {w}
        GROUP BY e.user_id),
  p AS (SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 {w}
        GROUP BY e.user_id)
  SELECT (SELECT cast(count(*) AS bigint) FROM v) AS n_view,
         (SELECT cast(count(*) AS bigint) FROM c) AS n_click_after_view,
         (SELECT cast(count(*) AS bigint) FROM p)
           AS n_purchase_after_click)""")
    return "\nUNION ALL".join(parts) + "\nORDER BY batch_id"


@register(
    "funnel_stream_replay",
    oracle=_oracle(),
    tags=("streaming", "funnel", "incremental", "replay"),
)
def funnel_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(batch_id, n_view, n_click_after_view, n_purchase_after_click)
    after each of 4 incremental batches through merge_funnel; oracle =
    from-scratch funnel at each cutoff (module docstring)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts")
    state = empty_funnel_state(spark)
    outs = []
    for i, (lo, hi) in enumerate(_bounds(), 1):
        cond = F.lit(True)
        if lo:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
        if hi:
            cond = cond & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
        state = merge_funnel(state, ev.filter(cond))
        outs.append(funnel_counts(state)
                    .select(F.lit(i).alias("batch_id"), "*"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("batch_id")


def _state_oracle() -> str:
    """Expected funnel-sink state accounting per batch: merge_funnel keeps
    exactly one state row per user that has EVER had a 'view' event (users
    enter via the full-outer join with the batch's view aggregate and are
    never dropped), so state cardinality after batch i = distinct view-users
    with ts below cut i; users_seen bounds it by total distinct users."""
    parts = []
    for i, (_lo, hi) in enumerate(_bounds(), 1):
        w = f"WHERE ts < TIMESTAMP '{hi}'" if hi else ""
        wv = (f"AND ts < TIMESTAMP '{hi}'" if hi else "")
        parts.append(f"""
SELECT {i} AS batch_id,
       (SELECT cast(count(DISTINCT user_id) AS bigint) FROM events
        WHERE event_type = 'view' {wv}) AS state_rows,
       (SELECT cast(count(DISTINCT user_id) AS bigint) FROM events
        {w}) AS users_seen""")
    return "\nUNION ALL".join(parts) + "\nORDER BY batch_id"


@register(
    "funnel_state_expected",
    oracle=_state_oracle(),
    tags=("streaming", "funnel", "state", "metrics"),
)
def funnel_state_expected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED state cardinality of the incremental funnel sink after each
    batch (one row per view-user, the _state_oracle docstring argument),
    beside the distinct-user ceiling that bounds it — the funnel edition of
    stream_state_expected (round-12 verdict item 6). The real merge_funnel
    state is asserted equal to state_rows per batch in
    test_stateful_streaming.py. Scale stance: events reduce ONCE to a
    per-user (first_view, first_seen) pair — map-side combinable — and
    only that O(users) frame fans out over the 4-row broadcast cut grid;
    no window, no repeated events scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
         .alias("first_view"),
        F.min("ts").alias("first_seen"))
    cuts = spark.createDataFrame(
        [(i, hi) for i, (_lo, hi) in enumerate(_bounds(), 1)],
        "batch_id int, hi string")
    hi_ts = F.col("hi").cast("timestamp_ntz")
    before = lambda c: F.col("hi").isNull() | (F.col(c) < hi_ts)  # noqa: E731
    return (u.crossJoin(F.broadcast(cuts))
            .groupBy("batch_id")
            .agg(F.count(F.when(before("first_view")
                                & F.col("first_view").isNotNull(), 1))
                  .cast("long").alias("state_rows"),
                 F.count(F.when(before("first_seen"), 1)).cast("long")
                  .alias("users_seen"))
            .orderBy("batch_id"))
