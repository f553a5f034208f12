"""Recurring streaming SPRT, driver-checkable: the Wald launch gate
(sprt10.py) re-evaluated after each of k=4 event micro-batches applied
through the REAL streaming sink transform
(streaming/sprt_sink.apply_events_delta — the same function the
foreachBatch monitor runs per micro-batch), with the per-day
sufficient-statistic state carried forward batch to batch. The round-10
ivm_stream replay proved recurring view maintenance stays bit-exact; this
proves the SEQUENTIAL-DECISION state machine does too: after every batch,
the maintained decision (decision, decision_day, cumulative micro-nat
LLR, days seen) must equal a from-scratch SPRT over the event prefix — an
unrolled oracle per cutoff, k independent recomputes.

Batching: the event timeline is cut at fixed dates; batch i delivers
events with ts in [T_{i-1}, T_i), so the gate sees the stream the way a
daily monitor would — the decision may sit at 'continue' for early
batches and harden as evidence accumulates, and a green row proves Spark
flips it on exactly the right batch AND day.

Scale stance: per batch, one delta-sized combinable rollup + a
days-cardinality merge (sprt_sink docstring); the decision is a window
over the days frame. The per-batch localCheckpoint mirrors the sink's
snapshot write, truncating lineage so batch k never re-runs batches
1..k-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..streaming.sprt_sink import apply_events_delta, empty_daily
from ..tables import load_table
from .sprt10 import _oracle as _sprt_oracle, decision_from_daily

# Timeline cutoffs: batch i covers [T_{i-1}, T_i); the last is unbounded,
# so batch 4's decision equals the fixed-corpus sprt_sequential_decision.
_CUTS = ["2024-01-08", "2024-01-16", "2024-01-24"]


def _batch_bounds() -> list[tuple[str | None, str | None]]:
    return list(zip([None] + _CUTS, _CUTS + [None]))


def _oracle() -> str:
    parts = []
    for i, (_lo, hi) in enumerate(_batch_bounds(), 1):
        where = f"WHERE ts < TIMESTAMP '{hi}'" if hi else ""
        parts.append(
            f"SELECT {i} AS batch_id, * FROM ({_sprt_oracle(where)}\n)")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY batch_id"


@register(
    "sprt_stream_decision_replay",
    oracle=_oracle(),
    tags=("evaluation", "sequential", "streaming", "replay",
          "scale-pattern"),
)
def sprt_stream_decision_replay(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """(batch_id, decision, decision_day, llr_micro_nats, n_days): the
    maintained Wald gate AFTER each of 4 event micro-batches, every batch
    folded through the streaming sink's own apply_events_delta. Oracle =
    from-scratch SPRT over each event prefix, so a green row proves the
    incrementally-maintained decision path never drifts from the
    fixed-horizon recompute — same stopping day, same exact LLR."""
    e = load_table(spark, sf_dir, "events").select("ts", "event_type")

    state = empty_daily(spark)
    outs = []
    for i, (lo, hi) in enumerate(_batch_bounds(), 1):
        cond = F.lit(True)
        if lo:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi:
            cond = cond & (F.col("ts") < F.lit(hi).cast("timestamp"))
        # Mirror of the sink's per-batch snapshot write: materialize the
        # days-sized state once so batch i+1 (and the stacked output)
        # reads blocks instead of re-deriving batches 1..i.
        state = (apply_events_delta(state, e.filter(cond))
                 .localCheckpoint(eager=False))
        outs.append(decision_from_daily(state)
                    .select(F.lit(i).alias("batch_id"), "decision",
                            "decision_day", "llr_micro_nats", "n_days"))

    out = outs[0]
    for v in outs[1:]:
        out = out.unionByName(v)
    return out.orderBy("batch_id")


# -------------------------------------------- state-size accounting (r13)

def _state_oracle() -> str:
    """Expected SPRT-sink state cardinality per batch: the maintained
    sufficient-statistic table holds exactly one row per event DAY seen so
    far (sprt_sink docstring), so state_rows after batch i = distinct
    date_trunc('day', ts) below the cut; events_seen bounds the compression
    ratio the days-sized state buys."""
    parts = []
    for i, (_lo, hi) in enumerate(_batch_bounds(), 1):
        w = f"WHERE ts < TIMESTAMP '{hi}'" if hi else ""
        parts.append(f"""
SELECT {i} AS batch_id,
       (SELECT cast(count(DISTINCT date_trunc('day', ts)) AS bigint)
        FROM events {w}) AS state_rows,
       (SELECT cast(count(*) AS bigint) FROM events {w}) AS events_seen""")
    return "\nUNION ALL".join(parts) + "\nORDER BY batch_id"


@register(
    "sprt_state_expected",
    oracle=_state_oracle(),
    tags=("evaluation", "sequential", "streaming", "state", "metrics"),
)
def sprt_state_expected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED per-batch state cardinality of the streaming SPRT monitor
    (one row per event day — _state_oracle docstring) beside the raw
    event count it compresses; the real apply_events_delta state is
    asserted equal per batch in test_round11_ops.py. Completes the
    state-accounting family: dedup (stream_state_expected), funnel, IVM,
    SPRT — every stateful sink's bound is now driver-hash-checked.

    Scale stance: events reduce ONCE to (first-seen day, per-day rows are
    implicit in the distinct count); only the per-day frame fans out over
    the broadcast 4-row cut grid."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"))
    per_day = ev.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    cuts = spark.createDataFrame(
        [(i, hi) for i, (_lo, hi) in enumerate(_batch_bounds(), 1)],
        "batch_id int, hi string")
    hi_ts = F.col("hi").cast("timestamp")
    in_cut = F.col("hi").isNull() | (F.col("day") < hi_ts)
    return (per_day.crossJoin(F.broadcast(cuts))
            .filter(in_cut)
            .groupBy("batch_id")
            .agg(F.count(F.lit(1)).cast("long").alias("state_rows"),
                 F.sum("n").cast("long").alias("events_seen"))
            .orderBy("batch_id"))
