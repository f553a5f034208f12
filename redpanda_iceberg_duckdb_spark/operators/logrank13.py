"""Log-rank (Mantel-Cox) test for the afternoon-vs-morning signup
conversion curves — the hypothesis-test companion of cox_ph_converged
(same durations, same risk sets): Cox says HOW BIG the hazard ratio is,
the log-rank says whether the curves differ at all, and the two must
agree in direction (the log-rank is the score test of the Cox model at
beta = 0 — asserted against cox's first Newton step in
test_round13_ops2).

Statistic, Breslow-tied, all exact integers until the final divisions:

    O1 = sum_t sx_t                      (observed group-1 events)
    E1 = sum_t d_t * n1_t / n_t          (expected under H0)
    V  = sum_t d_t * (n1_t/n_t) * (n0_t/n_t) * (n_t - d_t)/(n_t - 1)
    chi2 = (O1 - E1)^2 / V

E1 and V are rational; each per-time term is snapped ONCE to the micro
lattice (round half-away in both engines) and summed as integers — no
float-sum-order hazard. Times with n_t = 1 contribute zero variance and
are skipped by both engines identically.

Scale stance: identical to cox13 — one corpus reduction to per-user
(duration, event, x), one descending-cumulative window over the
retention-window-bounded duration curve, then curve-sized integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .cox13 import _CURVE_SQL, _HOUR_US

_LOGRANK_ORACLE = f"""
WITH {_CURVE_SQL},
terms AS (
  SELECT sx, d,
         cast(round(1e6 * d * n1 / (n0 + n1)) AS bigint) AS e1m,
         CASE WHEN n0 + n1 > 1 THEN
           cast(round(1e6 * d
                      * (cast(n1 AS double) / (n0 + n1))
                      * (cast(n0 AS double) / (n0 + n1))
                      * (n0 + n1 - d) / (n0 + n1 - 1)) AS bigint)
         ELSE 0 END AS vm
  FROM ev_t)
SELECT cast(sum(sx) AS bigint) AS o1,
       round(cast(sum(e1m) AS double) / 1e6, 6) AS e1,
       round(cast(sum(vm) AS double) / 1e6, 6) AS variance,
       round((sum(sx) - sum(e1m) / 1e6)
             * (sum(sx) - sum(e1m) / 1e6)
             / (sum(vm) / 1e6), 6) AS chi2
FROM terms"""


@register(
    "logrank_signup_conversion",
    oracle=_LOGRANK_ORACLE,
    tags=("survival", "hypothesis-test", "statistics"),
)
def logrank_signup_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank chi-square for afternoon-vs-morning signup conversion
    (module docstring): (o1, e1, variance, chi2), exact on the micro
    lattice until the final divisions."""
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
    at_t = durs.groupBy("t").agg(
        F.sum(1 - F.col("x")).alias("a0"), F.sum("x").alias("a1"),
        F.sum(F.col("ev") * (1 - F.col("x"))).alias("d0"),
        F.sum(F.col("ev") * F.col("x")).alias("d1"))
    w_desc = (W.orderBy(F.desc("t"))
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    curve = (at_t.select(
        "t", (F.col("d0") + F.col("d1")).alias("d"),
        F.col("d1").alias("sx"),
        F.sum("a0").over(w_desc).alias("n0"),
        F.sum("a1").over(w_desc).alias("n1"))
        .filter(F.col("d") >= 1))
    terms = curve.selectExpr(
        "sx", "d",
        "cast(round(1e6 * d * n1 / (n0 + n1)) AS bigint) AS e1m",
        "CASE WHEN n0 + n1 > 1 THEN "
        "cast(round(1e6 * d * (cast(n1 AS double) / (n0 + n1))"
        " * (cast(n0 AS double) / (n0 + n1))"
        " * (n0 + n1 - d) / (n0 + n1 - 1)) AS bigint) ELSE 0 END AS vm")
    return terms.selectExpr(
        "cast(sum(sx) AS bigint) AS o1",
        "round(cast(sum(e1m) AS double) / 1e6, 6) AS e1",
        "round(cast(sum(vm) AS double) / 1e6, 6) AS variance",
        "round((sum(sx) - sum(e1m) / 1e6) * (sum(sx) - sum(e1m) / 1e6)"
        " / (sum(vm) / 1e6), 6) AS chi2")
