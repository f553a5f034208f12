"""Brier score with Murphy decomposition for the hour-of-day purchase
model — the proper-scoring-rule eval the calibration family (ECE bins,
isotonic) reports pieces of, here as the full reliability / resolution /
uncertainty split on a REAL train/eval time cut (an in-sample
decomposition has reliability identically zero — nothing to verify).

Model: per-hour purchase rate fitted on events BEFORE the cut (empty
train bins fall back to the global train rate, stated so both engines
agree); evaluated on events AT/AFTER the cut.

Exactness: probabilities are snapped to the micro lattice with pure
integer HALF-UP division — p = (2e6*c + n) div (2n) — because a rational
c/n CAN land exactly on half a micro, where float round() would leave the
two engines one apart; integer div cannot. Every sum below is then an
exact integer; the four reported scores are one final division each.

    brier       = sum_b [k_b (1e6-p_b)^2 + (m_b-k_b) p_b^2] / (M 1e12)
    reliability = sum_b m_b (p_b - q_b)^2 / (M 1e12)
    resolution  = sum_b m_b (q_b - qbar)^2 / (M 1e12)
    uncertainty = qbar (1e6 - qbar) / 1e12

(q_b = snapped eval rate per bin, qbar = snapped global eval rate. The
textbook identity brier = rel - res + unc holds up to snapping — the
components are reported, not the identity.)

Scale stance (100 TB): two conditional aggregates keyed by hour bin (one
scan; map-side combinable), then 24-row grid algebra on broadcast frames.
No window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_CUT = "2024-01-16"

_BRIER_ORACLE = f"""
WITH pts AS (SELECT cast(extract(hour FROM ts) AS bigint) AS b,
                    CASE WHEN ts < TIMESTAMP '{_CUT}' THEN 1 ELSE 0 END
                      AS is_train,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             FROM events),
tr AS (SELECT b, cast(count(*) AS bigint) AS n,
              cast(sum(y) AS bigint) AS c
       FROM pts WHERE is_train = 1 GROUP BY b),
tg AS (SELECT (2000000 * sum(c) + sum(n)) // (2 * sum(n)) AS p_glob
       FROM tr),
evb AS (SELECT b, cast(count(*) AS bigint) AS m,
               cast(sum(y) AS bigint) AS k
        FROM pts WHERE is_train = 0 GROUP BY b),
eg AS (SELECT sum(m) AS mm, sum(k) AS kk,
              (2000000 * sum(k) + sum(m)) // (2 * sum(m)) AS qbar
       FROM evb),
j AS (SELECT evb.b, evb.m, evb.k,
             coalesce((2000000 * tr.c + tr.n) // (2 * tr.n),
                      (SELECT p_glob FROM tg)) AS p,
             (2000000 * evb.k + evb.m) // (2 * evb.m) AS q
      FROM evb LEFT JOIN tr ON tr.b = evb.b)
SELECT (SELECT cast(mm AS bigint) FROM eg) AS n_eval,
       (SELECT cast(kk AS bigint) FROM eg) AS n_eval_pos,
       round(cast(sum(k * (1000000 - p) * (1000000 - p)
                      + (m - k) * p * p) AS double)
             / (SELECT mm FROM eg) / 1e12, 6) AS brier,
       round(cast(sum(m * (p - q) * (p - q)) AS double)
             / (SELECT mm FROM eg) / 1e12, 6) AS reliability,
       round(cast(sum(m * (q - (SELECT qbar FROM eg))
                        * (q - (SELECT qbar FROM eg))) AS double)
             / (SELECT mm FROM eg) / 1e12, 6) AS resolution,
       round(cast((SELECT qbar FROM eg)
                  * (1000000 - (SELECT qbar FROM eg)) AS double)
             / 1e12, 6) AS uncertainty
FROM j"""


@register(
    "brier_decomposition_hourly",
    oracle=_BRIER_ORACLE,
    tags=("evaluation", "calibration", "scoring-rule"),
)
def brier_decomposition_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + Murphy decomposition of the train-half hour-of-day
    purchase model on the eval half (module docstring); all probabilities
    on the integer half-up micro lattice."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.hour("ts").cast("long").alias("b"),
        (F.col("ts") < F.lit(_CUT).cast("timestamp")).cast("int")
        .alias("is_train"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"))
    tr = (pts.filter("is_train = 1").groupBy("b")
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum("y").cast("long").alias("c")))
    tg = tr.agg(F.expr("(2000000 * sum(c) + sum(n)) div (2 * sum(n))")
                .alias("p_glob"))
    evb = (pts.filter("is_train = 0").groupBy("b")
           .agg(F.count(F.lit(1)).cast("long").alias("m"),
                F.sum("y").cast("long").alias("k")))
    eg = evb.agg(F.sum("m").alias("mm"), F.sum("k").alias("kk"),
                 F.expr("(2000000 * sum(k) + sum(m)) div (2 * sum(m))")
                 .alias("qbar"))
    j = (evb.join(tr, "b", "left_outer")
         .crossJoin(F.broadcast(tg))
         .crossJoin(F.broadcast(eg))
         .selectExpr(
             "m", "k", "mm", "kk", "qbar",
             "coalesce((2000000 * c + n) div (2 * n), p_glob) AS p",
             "(2000000 * k + m) div (2 * m) AS q"))
    return j.agg(
        F.max("mm").cast("long").alias("n_eval"),
        F.max("kk").cast("long").alias("n_eval_pos"),
        F.round(F.sum(F.expr(
            f"cast(k * (1000000 - p) * (1000000 - p) AS {dec})"
            f" + cast((m - k) * p * p AS {dec})")).cast("double")
            / F.max("mm") / 1e12, 6).alias("brier"),
        F.round(F.sum(F.expr(
            f"cast(m * (p - q) * (p - q) AS {dec})")).cast("double")
            / F.max("mm") / 1e12, 6).alias("reliability"),
        F.round(F.sum(F.expr(
            f"cast(m * (q - qbar) * (q - qbar) AS {dec})")).cast("double")
            / F.max("mm") / 1e12, 6).alias("resolution"),
        F.round(F.max(F.expr(
            f"cast(qbar * (1000000 - qbar) AS {dec})")).cast("double")
            / 1e12, 6).alias("uncertainty"))
