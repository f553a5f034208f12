"""Dynamic time warping between the weekday and weekend hour-of-day
profiles — the alignment distance the circular EMD (ot13) deliberately
is not: EMD moves mass, DTW warps TIME, so a weekend that runs "two
hours later" scores near zero under DTW while EMD prices the full shift.
The classic sequence-alignment operator Spark has no builtin for.

Profiles are per-mille integer shapes (half-up lattice, brier13's rule),
cost c(i,j) = |pa_i - pb_j|. The DP is exact integer min-plus:

    dp[i][j] = c(i,j) + min(dp[i-1][j], dp[i-1][j-1], dp[i][j-1])

The within-row dependency is eliminated with the enter-column closed
form — a path reaches (i, j) by entering row i at some column k and
moving right — so each row is a pure comprehension over the previous row
(no sequential inner fold, which neither engine's lambda toolkit can
express with a list accumulator):

    S[j]   = prefix sum of row i's costs
    q[k]   = min(prev[k], prev[k-1])        (q[0] = prev[0])
    new[j] = S[j] + min_{k<=j} (q[k] - S[k-1])     (S[-1] = 0)

The outer 24-step recurrence is an aggregate() fold in Spark and a
recursive CTE in DuckDB — 24 x 24 integer ops, identical on both.

Scale stance (100 TB): the corpus reduces once to two 24-bin conditional
counts; the DP runs on the bounded grid (1-row frame). No window, no
driver loop, no data-sized shuffle after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_DTW_ORACLE = """
WITH RECURSIVE pts AS (
  SELECT cast(extract(hour FROM ts) AS bigint) AS h,
         CASE WHEN extract(isodow FROM ts) <= 5 THEN 1 ELSE 0 END AS wd
  FROM events),
hc AS (SELECT g.h,
              (SELECT coalesce(sum(CASE WHEN wd = 1 THEN 1 ELSE 0 END), 0)
               FROM pts WHERE pts.h = g.h) AS c1,
              (SELECT coalesce(sum(CASE WHEN wd = 0 THEN 1 ELSE 0 END), 0)
               FROM pts WHERE pts.h = g.h) AS c2
       FROM (SELECT unnest(range(24)) AS h) g),
n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM hc),
lists AS (SELECT list(c1 ORDER BY h) AS l1, list(c2 ORDER BY h) AS l2
           FROM hc),
prof AS (SELECT [(2000 * x + n1) // (2 * n1) FOR x IN l1] AS pa,
                [(2000 * x + n2) // (2 * n2) FOR x IN l2] AS pb
         FROM lists, n),
it AS (
  SELECT 0 AS i,
         [list_sum([abs(pa[1] - pb[m + 1])
                    FOR m IN range(j + 1)]) FOR j IN range(24)] AS dp
  FROM prof
  UNION ALL
  SELECT it.i + 1,
         [ list_sum([abs(pa[it.i + 2] - pb[m + 1]) FOR m IN range(j + 1)])
           + list_min([
               (CASE WHEN k = 0 THEN it.dp[1]
                     ELSE least(it.dp[k + 1], it.dp[k]) END)
               - CASE WHEN k = 0 THEN 0
                      ELSE list_sum([abs(pa[it.i + 2] - pb[m + 1])
                                     FOR m IN range(k)]) END
             FOR k IN range(j + 1)])
           FOR j IN range(24) ]
  FROM it, prof WHERE it.i < 23),
fin AS (SELECT dp FROM it WHERE i = 23)
SELECT (SELECT cast(n1 AS bigint) FROM n) AS n_weekday,
       (SELECT cast(n2 AS bigint) FROM n) AS n_weekend,
       cast(dp[24] AS bigint) AS dtw_cost_permille,
       round(dp[24] / 1000.0, 6) AS dtw_cost
FROM fin"""


@register(
    "dtw_hour_profiles",
    oracle=_DTW_ORACLE,
    tags=("timeseries", "alignment", "drift"),
)
def dtw_hour_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer DTW distance between the per-mille weekday and
    weekend hour profiles (module docstring): (n_weekday, n_weekend,
    dtw_cost_permille, dtw_cost)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.hour("ts").cast("long").alias("h"),
        (F.expr("extract(DAYOFWEEK_ISO FROM ts)") <= 5).cast("int")
        .alias("wd"))
    raw = pts.groupBy("h").agg(
        F.sum("wd").cast("long").alias("c1"),
        F.sum(1 - F.col("wd")).cast("long").alias("c2"))
    grid = spark.range(24).select(F.col("id").alias("h"))
    hc = (grid.join(raw, "h", "left_outer")
          .select("h", F.coalesce("c1", F.lit(0)).alias("c1"),
                  F.coalesce("c2", F.lit(0)).alias("c2")))
    one = (hc.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2"),
        F.array_sort(F.collect_list(F.struct("h", "c1", "c2"))).alias("a"))
        .selectExpr(
            "n1", "n2",
            "transform(a, x -> (2000 * x.c1 + n1) div (2 * n1)) AS pa",
            "transform(a, x -> (2000 * x.c2 + n2) div (2 * n2)) AS pb"))
    dp = one.selectExpr("n1", "n2", """
      aggregate(
        sequence(1, 23),
        transform(sequence(0, 23), j ->
          aggregate(slice(pb, 1, j + 1), cast(0 AS bigint),
                    (acc, x) -> acc + abs(element_at(pa, 1) - x))),
        (prev, i) -> transform(sequence(0, 23), j ->
          aggregate(sequence(0, j), cast(1000000000000000000 AS bigint),
            (best, k) -> least(best,
              (CASE WHEN k = 0 THEN element_at(prev, 1)
                    ELSE least(element_at(prev, k + 1),
                               element_at(prev, k)) END)
              - aggregate(slice(pb, 1, k), cast(0 AS bigint),
                          (a2, x) -> a2
                          + abs(element_at(pa, i + 1) - x))))
          + aggregate(slice(pb, 1, j + 1), cast(0 AS bigint),
                      (a3, x) -> a3 + abs(element_at(pa, i + 1) - x)))
      ) AS dp""")
    return dp.selectExpr(
        "cast(n1 AS bigint) AS n_weekday",
        "cast(n2 AS bigint) AS n_weekend",
        "cast(element_at(dp, 24) AS bigint) AS dtw_cost_permille",
        "round(cast(element_at(dp, 24) AS double) / 1000.0, 6)"
        " AS dtw_cost")
