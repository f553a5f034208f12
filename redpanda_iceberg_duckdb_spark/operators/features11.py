"""Feature-engineering closers (round-11 pending batch): rolling-origin
cross-validation folds (Tashman 2000's out-of-sample forecast evaluation
protocol — the TEMPORAL CV every forecasting pipeline needs where random
K-folds would leak the future into training) and weight-of-evidence /
information-value binning (the credit-scoring feature screen; Siddiqi,
"Credit Risk Scorecards" 2006) of hour-of-day against the purchase
label.

Exactness discipline:
- Rolling-origin folds are pure date arithmetic: fold f trains on days
  [1, 7f] and tests on days (7f, 7f+7]; the output is per-(fold, split)
  event/user counts — all integers.
- WoE rides the micro-nat lattice (nblm10.py): each bin's
  ln((pos_b / POS) / (neg_b / NEG)) = ln(pos_b * NEG) - ln(neg_b * POS)
  is snapped ONCE per bin via cast(round(ln(x) * 1e6) as bigint) on the
  identical integer products, so both engines agree despite libm; the
  IV term scales the exact rational (pos_b * NEG - neg_b * POS) /
  (POS * NEG) by the snapped WoE — one final division per bin.
  Add-one smoothing on both counts keeps empty cells finite.

Scale stance (100 TB): both reduce to ONE combinable rollup (per-day /
per-bin counts); folds and bins are constant-cardinality frames after
it. Nothing downstream of the first aggregate is data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_FOLDS = 4
_STEP = 7          # days per expansion step / test horizon
_EPOCH_DAY = "epoch_us(ts) // 86400000000"        # DuckDB
_EPOCH_DAY_SPARK = "unix_micros(ts) div 86400000000"


def _cv_oracle() -> str:
    parts = []
    for f in range(1, _FOLDS + 1):
        parts.append(f"""
SELECT {f} AS fold, 'train' AS split,
       cast(count(*) AS bigint) AS n_events,
       cast(count(DISTINCT user_id) AS bigint) AS n_users,
       cast(max(d) - min(d) + 1 AS bigint) AS n_days
FROM (SELECT user_id, {_EPOCH_DAY} - (SELECT min({_EPOCH_DAY}) FROM events)
             AS d FROM events)
WHERE d < {7 * f}
UNION ALL
SELECT {f} AS fold, 'test' AS split,
       cast(count(*) AS bigint) AS n_events,
       cast(count(DISTINCT user_id) AS bigint) AS n_users,
       cast(max(d) - min(d) + 1 AS bigint) AS n_days
FROM (SELECT user_id, {_EPOCH_DAY} - (SELECT min({_EPOCH_DAY}) FROM events)
             AS d FROM events)
WHERE d >= {7 * f} AND d < {7 * (f + 1)}""")
    return "\nUNION ALL".join(parts) + "\nORDER BY fold, split"


@register(
    "rolling_origin_cv_folds",
    oracle=_cv_oracle(),
    tags=("ml", "evaluation", "timeseries", "leakage"),
)
def rolling_origin_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fold, split, n_events, n_users, n_days): expanding-window
    temporal CV — fold f trains on the first 7f days and tests on the
    next 7; train always precedes test so the future never leaks (the
    forecasting counterpart of leakage_safe_splits' near-dup hygiene
    and stratified_kfold_assignment's random folds)."""
    e = load_table(spark, sf_dir, "events")
    d0 = e.agg(F.min(F.expr(_EPOCH_DAY_SPARK)).alias("d0"))
    # Checkpointed: all 2*_FOLDS union branches below filter/aggregate
    # this frame, and each branch re-ran the events scan (+ the d0
    # bounds scan) without it — 16 scans of events in one plan (r15
    # scan audit). Narrow (user_id, day) columns, materialized once.
    days = (e.select("user_id", F.expr(_EPOCH_DAY_SPARK).alias("dd"))
            .crossJoin(F.broadcast(d0))
            .select("user_id", (F.col("dd") - F.col("d0")).alias("d"))
            ).localCheckpoint(eager=True)
    outs = []
    for f in range(1, _FOLDS + 1):
        for split, cond in (("train", F.col("d") < 7 * f),
                            ("test", (F.col("d") >= 7 * f)
                             & (F.col("d") < 7 * (f + 1)))):
            outs.append(
                days.filter(cond).agg(
                    F.lit(f).alias("fold"), F.lit(split).alias("split"),
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.countDistinct("user_id").cast("long")
                    .alias("n_users"),
                    (F.max("d") - F.min("d") + 1).cast("long")
                    .alias("n_days")))
    out = outs[0]
    for v in outs[1:]:
        out = out.unionByName(v)
    return out.orderBy("fold", "split")


def _woe_oracle() -> str:
    return """
WITH b AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1),
t AS (SELECT cast(sum(pos) AS bigint) AS tp,
             cast(sum(n - pos) AS bigint) AS tn FROM b),
w AS (
  SELECT b.hod, b.n, b.pos, b.n - b.pos AS neg, t.tp, t.tn,
         cast(round(ln(cast((b.pos + 1) AS double) * (t.tn + 24)
                       / ((b.n - b.pos + 1)
                          * cast(t.tp + 24 AS double))) * 1e6) AS bigint)
           AS woe_micronat
  FROM b, t)
SELECT hod, cast(n AS bigint) AS n, cast(pos AS bigint) AS pos,
       woe_micronat,
       round((cast(pos + 1 AS double) / (tp + 24)
              - cast(neg + 1 AS double) / (tn + 24))
             * woe_micronat / 1e6, 6) AS iv_term
FROM w ORDER BY hod"""


@register(
    "woe_iv_hour_bins",
    oracle=_woe_oracle(),
    tags=("ml", "features", "statistics"),
)
def woe_iv_hour_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hod, n, pos, woe_micronat, iv_term): weight of evidence and
    per-bin information-value terms of hour-of-day against the purchase
    label, add-one smoothed — WoE snapped once per bin to micro-nats on
    identical integer products, IV as one division per bin (module
    docstring). Sum of iv_term is the feature's IV; bins are emitted so
    the monotonicity/shape is inspectable data."""
    e = load_table(spark, sf_dir, "events")
    b = (e.groupBy(F.expr("(unix_micros(ts) div 3600000000) % 24")
                   .alias("hod"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.when(F.col("event_type") == "purchase", 1)
                    .otherwise(0)).alias("pos")))
    t = b.agg(F.sum("pos").cast("long").alias("tp"),
              F.sum(F.col("n") - F.col("pos")).cast("long").alias("tn"))
    w = (b.crossJoin(F.broadcast(t))
         .withColumn("neg", F.col("n") - F.col("pos"))
         .withColumn(
             "woe_micronat",
             F.round(F.log((F.col("pos") + 1).cast("double")
                           * (F.col("tn") + 24)
                           / ((F.col("neg") + 1)
                              * (F.col("tp") + 24).cast("double")))
                     * 1e6).cast("bigint")))
    return (w.select(
        "hod", F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("pos"), "woe_micronat",
        F.round(((F.col("pos") + 1).cast("double") / (F.col("tp") + 24)
                 - (F.col("neg") + 1).cast("double") / (F.col("tn") + 24))
                * F.col("woe_micronat") / 1e6, 6).alias("iv_term"))
        .orderBy("hod"))
