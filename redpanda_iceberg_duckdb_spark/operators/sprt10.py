"""Wald's sequential probability ratio test (Wald 1945) over the daily
event stream — the sequential-decision closer of the eval tier: instead of
a fixed-horizon test (ANOVA/KS/permutation), monitor the purchase-rate
log-likelihood ratio day by day and STOP the first day it crosses a
boundary, the shape of a production launch gate ("ship / kill / keep
collecting").

H0: conversion rate p0 = 0.20, H1: p1 = 0.25, alpha = beta = 0.05. All
arithmetic rides the micro-nat integer lattice (the nblm10 discipline):
the two per-event LLR increments and the two Wald boundaries
ln((1-b)/a), ln(b/(1-a)) are FIXED integer literals embedded in both
plans (libm log is not cross-engine identically rounded; four constants
computed once eliminate the hazard). A day contributes
c_d * L1 + (n_d - c_d) * L0 — one combinable aggregate per day — and the
cumulative LLR is a window over the DAYS frame (a few hundred rows at any
scale; the only data-sized cost is the daily rollup scan). Decision = the
first day the cumulation leaves (B, A); emitted with the boundary it
crossed, or 'continue' if the stream ends inside the band.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_P0, _P1 = 0.20, 0.25
_ALPHA = _BETA = 0.05
# micro-nat integer literals, computed once here and embedded in BOTH plans
_L1 = round(math.log(_P1 / _P0) * 1_000_000)              # +223144
_L0 = round(math.log((1 - _P1) / (1 - _P0)) * 1_000_000)  # -64539
_A = round(math.log((1 - _BETA) / _ALPHA) * 1_000_000)    # +2944439
_B = round(math.log(_BETA / (1 - _ALPHA)) * 1_000_000)    # -2944439


def _oracle(where: str = "") -> str:
    """Unrolled decision SQL; ``where`` restricts the event prefix (the
    streaming replay in sprt_stream.py re-runs this at each cutoff)."""
    return f"""
WITH d AS (
  SELECT cast(date_trunc('day', ts) AS timestamp) AS day,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
  FROM events {where} GROUP BY 1),
cum AS (
  SELECT day, n, c,
         sum(c * {_L1} + (n - c) * {_L0}) OVER (ORDER BY day) AS llr
  FROM d),
hit AS (
  SELECT day, llr,
         CASE WHEN llr >= {_A} THEN 'accept_h1'
              WHEN llr <= {_B} THEN 'accept_h0' END AS decision
  FROM cum),
first_hit AS (
  SELECT day, llr, decision FROM hit WHERE decision IS NOT NULL
  ORDER BY day LIMIT 1),
tail AS (
  SELECT max(day) AS day, cast(count(*) AS bigint) AS n_days,
         (SELECT llr FROM cum ORDER BY day DESC LIMIT 1) AS llr
  FROM cum)
SELECT coalesce(f.decision, 'continue') AS decision,
       coalesce(f.day, t.day) AS decision_day,
       cast(coalesce(f.llr, t.llr) AS bigint) AS llr_micro_nats,
       t.n_days
FROM tail t LEFT JOIN first_hit f ON TRUE"""


@register(
    "sprt_sequential_decision",
    oracle=_oracle(),
    tags=("evaluation", "statistics", "sequential", "scale-pattern"),
)
def sprt_sequential_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decision, decision_day, llr_micro_nats, n_days): Wald SPRT of
    purchase rate 0.25 vs 0.20 at alpha = beta = 0.05, stopping at the
    first day the exact micro-nat cumulative LLR leaves the Wald band
    (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    d = daily_stats(e)
    return decision_from_daily(d)


def daily_stats(events: DataFrame) -> DataFrame:
    """Per-day SPRT sufficient statistics (day, n, c) — ONE combinable
    aggregate over the event scan; everything downstream is days-sized."""
    return (events
            .groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("c")))


def decision_from_daily(d: DataFrame) -> DataFrame:
    """The Wald decision plan over a (day, n, c) frame — shared by the
    fixed-corpus query above and the streaming replay
    (operators/sprt_stream.py), so the gate logic cannot fork."""
    # DAYS-sized frame from here on: the single-partition window is over
    # a few hundred rows at any SF (documented trade, module docstring).
    wd = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cum = d.withColumn(
        "llr", F.sum(F.col("c") * _L1 + (F.col("n") - F.col("c")) * _L0)
        .over(wd))
    hit = cum.withColumn(
        "decision",
        F.when(F.col("llr") >= _A, "accept_h1")
        .when(F.col("llr") <= _B, "accept_h0"))
    first_hit = (hit.where(F.col("decision").isNotNull())
                 .orderBy("day").limit(1)
                 .select(F.col("decision").alias("f_decision"),
                         F.col("day").alias("f_day"),
                         F.col("llr").alias("f_llr")))
    tail = (cum.orderBy(F.desc("day")).limit(1)
            .select(F.col("day").alias("t_day"),
                    F.col("llr").alias("t_llr")))
    n_days = cum.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (tail.crossJoin(F.broadcast(n_days))
            .join(F.broadcast(first_hit), F.lit(True), "left")
            .select(F.coalesce("f_decision", F.lit("continue"))
                    .alias("decision"),
                    F.coalesce("f_day", "t_day").alias("decision_day"),
                    F.coalesce("f_llr", "t_llr").alias("llr_micro_nats"),
                    "n_days"))
