"""Cox proportional-hazards regression fitted to convergence — the
survival-family counterpart of the converged logistic IRLS (glm12.py),
completing the progression KM curve (survival.py) -> Nelson-Aalen hazard
(survival12.py) -> a fitted hazard MODEL. One binary covariate (afternoon
signup: hour-of-day of first signup >= 12), Breslow tie handling.

With a binary covariate the partial likelihood needs only per-event-time
integers: d (events), sx (events with x=1), and risk-set counts n0/n1 —
all BETA-INDEPENDENT, so the whole Newton loop runs on the distinct-
duration curve after one corpus reduction:

    grad(b)  = sum_t [ sx_t - d_t * p_t ],  p_t = n1_t e^b / (n0_t + n1_t e^b)
    -hess(b) = sum_t [ d_t * p_t * (1 - p_t) ]

Lattice discipline: beta lives in integer micros; per event time the grad/
hess terms are snapped to micros BEFORE summing (order-free integer sums —
no float-sum hazard), the Newton step is round(1e6 * G / H) on those
integers, and convergence is |step| <= 1 micro, UNAPPLIED (Newton's
contraction can round into a +-1-micro two-cycle around a root that sits
between lattice points; a step below the lattice resolution carries no
information, so both engines stop there identically). e^b carries the usual
accepted 1-ulp libm risk (every micro-nat ln/exp oracle in this repo).

Scale stance (100 TB): the corpus is reduced ONCE to per-user
(duration, event, x) rows, then to the distinct-duration curve with
descending-cumulative risk counts — retention-window-bounded, the KM/NA
curve shape. The Newton loop then iterates on that curve (collected —
KBs, the offsets-table pattern); per-iteration work is curve-sized, not
corpus-sized, which is why a driver loop here is the scale-CORRECT
design rather than a compromise. The DuckDB oracle is a recursive CTE
running the identical recurrence over the identical curve CTE.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_HOUR_US = 3_600_000_000
_MAX_ITERS = 40


def _snap(x: float) -> int:
    """Round-half-AWAY-from-zero to int — SQL round() semantics. Bare
    Python round() is half-even, and exactly-representable .5 terms are
    reachable here (iteration 1 has e^b = 1, so p = n1/(n0+n1) is exact
    whenever the risk set is a power of two — round-13 advice), which
    would shift g/h/db by one micro relative to the DuckDB oracle.
    Decimal(float) is exact, so this is bit-faithful for every input."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

_CURVE_SQL = f"""
ends AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
signup AS (
  SELECT user_id, min(epoch_us(ts)) AS su
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
conv AS (
  SELECT s.user_id, s.su, min(epoch_us(e.ts)) AS pu
  FROM signup s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND epoch_us(e.ts) >= s.su
  GROUP BY s.user_id, s.su),
durs AS (
  SELECT CASE WHEN pu IS NOT NULL THEN (pu - su) // {_HOUR_US}
              ELSE ((SELECT end_us FROM ends) - su) // {_HOUR_US} END AS t,
         CASE WHEN pu IS NOT NULL THEN 1 ELSE 0 END AS ev,
         CASE WHEN (su // {_HOUR_US}) % 24 >= 12 THEN 1 ELSE 0 END AS x
  FROM conv),
at_t AS (SELECT t,
                sum(1 - x) AS a0, sum(x) AS a1,
                sum(ev * (1 - x)) AS d0, sum(ev * x) AS d1
         FROM durs GROUP BY t),
curve AS (
  SELECT t, d0 + d1 AS d, d1 AS sx,
         sum(a0) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS n0,
         sum(a1) OVER (ORDER BY t DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS n1
  FROM at_t),
ev_t AS (SELECT t, cast(d AS bigint) AS d, cast(sx AS bigint) AS sx,
                cast(n0 AS bigint) AS n0, cast(n1 AS bigint) AS n1
         FROM curve WHERE d >= 1)"""

# Per-iteration micro-snapped Newton aggregates over ev_t, given beta b
# (integer micros). Shared verbatim (after name substitution) by the
# recursive oracle; the Spark side executes the same arithmetic in the
# driver loop below.
_STEP_SQL = """
SELECT cast(sum(cast(round(1e6 * (sx - d * (n1 * exp({b} / 1e6))
                                      / (n0 + n1 * exp({b} / 1e6))))
                     AS bigint)) AS bigint) AS g,
       cast(sum(cast(round(1e6 * d * ((n1 * exp({b} / 1e6))
                                      / (n0 + n1 * exp({b} / 1e6)))
                               * (n0 / (n0 + n1 * exp({b} / 1e6))))
                     AS bigint)) AS bigint) AS h
FROM ev_t"""


def _cox_oracle() -> str:
    step = _STEP_SQL.format(b="it.b")
    return f"""
WITH RECURSIVE {_CURVE_SQL},
it AS (
  SELECT 0 AS k, cast(0 AS bigint) AS b, 1 AS moved
  UNION ALL
  SELECT m.k + 1,
         m.b + CASE WHEN abs(m.db) <= 1 THEN 0 ELSE m.db END,
         CASE WHEN abs(m.db) <= 1 THEN 0 ELSE 1 END
  FROM (
    SELECT it.k, it.b,
           cast(round(1e6 * s.g / s.h) AS bigint) AS db
    FROM it, ({step}) s
    WHERE it.moved = 1 AND it.k < {_MAX_ITERS}) m),
fin AS (SELECT * FROM it WHERE k = (SELECT max(k) FROM it))
SELECT (SELECT cast(count(*) AS bigint) FROM durs) AS n_subjects,
       (SELECT cast(count(*) AS bigint) FROM ev_t) AS n_event_times,
       cast(k AS bigint) AS n_iters,
       b AS beta_micro,
       round(exp(b / 1e6), 6) AS hazard_ratio
FROM fin"""


@register(
    "cox_ph_converged",
    oracle=_cox_oracle(),
    tags=("survival", "regression", "iterative", "convergence"),
)
def cox_ph_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox PH hazard ratio of afternoon-signup on signup->purchase
    conversion, Newton-fitted until the micro-beta step falls below the
    lattice resolution (module docstring). Returns (n_subjects, n_event_times, n_iters,
    beta_micro, hazard_ratio)."""
    ev = load_table(spark, sf_dir, "events")
    end = ev.agg(F.max(F.unix_micros("ts")).alias("end_us"))
    signup = (ev.filter(F.col("event_type") == "signup")
              .groupBy("user_id")
              .agg(F.min(F.unix_micros("ts")).alias("su")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", F.unix_micros("ts").alias("p_us")))
    conv = (signup.join(pur, "user_id", "left")
            .filter(F.col("p_us").isNull() | (F.col("p_us") >= F.col("su")))
            .groupBy("user_id", "su").agg(F.min("p_us").alias("pu")))
    conv = signup.join(conv.select("user_id", "pu"), "user_id", "left")
    durs = (conv.crossJoin(F.broadcast(end))
            .select(
                F.when(F.col("pu").isNotNull(),
                       F.expr(f"(pu - su) div {_HOUR_US}"))
                .otherwise(F.expr(f"(end_us - su) div {_HOUR_US}"))
                .alias("t"),
                F.when(F.col("pu").isNotNull(), 1).otherwise(0).alias("ev"),
                (F.expr(f"(su div {_HOUR_US}) % 24") >= 12).cast("int")
                .alias("x")))
    # Checkpointed: both actions (the subject count and the risk-curve
    # collect) read durs, and without it each action re-runs the whole
    # 3-branch events DAG (r10 multi-branch lesson). O(users) rows,
    # distributed.
    durs = durs.localCheckpoint(eager=True)
    n_subjects = durs.count()
    at_t = durs.groupBy("t").agg(
        F.sum(1 - F.col("x")).alias("a0"), F.sum("x").alias("a1"),
        F.sum(F.col("ev") * (1 - F.col("x"))).alias("d0"),
        F.sum(F.col("ev") * F.col("x")).alias("d1"))
    w_desc = (W.orderBy(F.desc("t"))
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    curve = at_t.select(
        "t", (F.col("d0") + F.col("d1")).alias("d"),
        F.col("d1").alias("sx"),
        F.sum("a0").over(w_desc).alias("n0"),
        F.sum("a1").over(w_desc).alias("n1"))
    # Curve rows are retention-window-bounded (distinct durations) — the
    # offsets-table collect; the Newton loop below is pure curve math.
    rows = [(int(r["t"]), int(r["d"]), int(r["sx"]), int(r["n0"]),
             int(r["n1"]))
            for r in curve.filter(F.col("d") >= 1).collect()]
    b = 0
    n_iters = 0
    for _ in range(_MAX_ITERS):
        eb = math.exp(b / 1e6)
        g = h = 0
        for _t, d, sx, n0, n1 in rows:
            denom = n0 + n1 * eb
            p = (n1 * eb) / denom
            g += _snap(1e6 * (sx - d * p))
            h += _snap(1e6 * d * p * (n0 / denom))
        db = _snap(1e6 * g / h)
        n_iters += 1
        if abs(db) <= 1:
            break          # at (or within one lattice step of) the root
        b += db
    else:
        raise RuntimeError(f"Cox Newton: no convergence in {_MAX_ITERS}")
    return spark.createDataFrame(
        [(n_subjects, len(rows), n_iters, b,
          float(round(math.exp(b / 1e6), 6)))],
        "n_subjects long, n_event_times long, n_iters long, "
        "beta_micro long, hazard_ratio double")
