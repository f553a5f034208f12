"""Deterministic bootstrap confidence intervals at scale — the Poisson
bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
Streams", Google 2012): instead of materializing B resampled copies of
the data, each row carries B Poisson(1) weights and every replica is a
weighted aggregate. One scan, B×2 map-side-combinable sums, no data
duplication — THE way to put error bars on a 100 TB aggregate.

Determinism: the per-(row, replica) Poisson draw is a pure function of
md5(event_id:replica) pushed through the inverse-CDF ladder of Poisson(1)
(thresholds = cumulative probabilities scaled to integers out of 10^6:
367879, 735759, 919699, 981012, 996340, 999406, 999917), so both engines
draw the SAME weights and replica means match bitwise (value sums in
decimal; the replica mean is a true quotient, rounded at 6 dp on both
sides). The CI is RANK-based over the B=32 replica means (2nd smallest /
2nd largest ≈ a 94% interval) — order statistics of identical lists, no
float interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_B = 32
# Inverse CDF of Poisson(1) as integer thresholds out of 1e6.
_THRESH = (367879, 735759, 919699, 981012, 996340, 999406, 999917)
_MOD = 1_000_000


def _w_case(h: str) -> str:
    """Weight expression: count of thresholds <= h (same SQL both engines)."""
    return ("(" + " + ".join(
        f"(CASE WHEN {h} >= {t} THEN 1 ELSE 0 END)" for t in _THRESH) + ")")


_W_DUCK = ", ".join(
    _w_case(md5_mod_duck("event_id || ':' || " + str(b), _MOD)) + f" AS w{b}"
    for b in range(_B))
_M_DUCK = ", ".join(
    f"round(cast(sum(w{b} * v) AS double) / nullif(sum(w{b}), 0), 6)"
    f" AS m{b}" for b in range(_B))
# A replica whose weights all drew 0 for a group has a NULL mean; DuckDB's
# list_sort and Spark's array_sort place NULLs at OPPOSITE ends, which
# would shift the rank-based CI bounds (round-8 advice). Coalesce to the
# group mean so both engines sort identical non-NULL lists (probability
# ~e^-n per replica — the coalesce is a determinism guarantee, not a
# statistical correction).
_MS_DUCK = ", ".join(f"coalesce(m{b}, mean_value)" for b in range(_B))


@register(
    "bootstrap_ci_by_type",
    oracle=f"""
WITH w AS (
  SELECT event_type, cast(value AS decimal(18,2)) AS v,
         {_W_DUCK}
  FROM events),
reps AS (
  SELECT event_type,
         {_M_DUCK},
         round(cast(sum(v) AS double) / count(*), 6) AS mean_value,
         count(*) AS n_rows
  FROM w GROUP BY event_type),
arr AS (
  SELECT event_type, mean_value, n_rows,
         list_sort([{_MS_DUCK}]) AS ms
  FROM reps)
SELECT event_type, cast(n_rows AS bigint) AS n_rows, mean_value,
       ms[2] AS ci_lo, ms[{_B - 1}] AS ci_hi
FROM arr ORDER BY event_type""",
    tags=("statistics", "bootstrap", "scale-pattern"),
)
def bootstrap_ci_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean of `value` with a rank-based ~94% Poisson-
    bootstrap CI (B=32 replicas as weight columns — module docstring).
    Plan shape: ONE scan, one aggregate with 65 map-side-combinable sums;
    the per-row weight ladder is pure integer expression work inside
    whole-stage codegen. No resampled copies, no second pass, no UDF."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    w_cols = [F.expr(_w_case(
        md5_mod_spark(f"concat(cast(event_id as string), ':', {b})", _MOD)))
        .alias(f"w{b}") for b in range(_B)]
    w = e.select("event_type", v.alias("v"), *w_cols)
    rep_aggs = [F.round(F.sum(F.col(f"w{b}") * F.col("v")).cast("double")
                        / F.nullif(F.sum(f"w{b}").cast("double"), F.lit(0)),
                        6).alias(f"m{b}") for b in range(_B)]
    reps = (w.groupBy("event_type")
            .agg(*rep_aggs,
                 F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6)
                 .alias("mean_value"),
                 F.count(F.lit(1)).alias("n_rows")))
    ms = F.array_sort(F.array(*[
        F.coalesce(F.col(f"m{b}"), F.col("mean_value"))
        for b in range(_B)]))
    return (reps.select(
        "event_type", F.col("n_rows").cast("bigint").alias("n_rows"),
        "mean_value",
        ms.getItem(1).alias("ci_lo"),
        ms.getItem(_B - 2).alias("ci_hi"))
        .orderBy("event_type"))
