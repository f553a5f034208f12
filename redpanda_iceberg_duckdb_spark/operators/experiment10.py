"""Experiment-analysis tier 2: difference-in-differences and the Qini
uplift decile table — the two readouts a causal-metrics pipeline adds
once plain A/B means (experiment_stats.py CUPED) are in place.

DiD: effect = (post_T - pre_T) - (post_C - pre_C), the standard
parallel-trends estimator for a launch that hits one group at a known
time. Arms are hash-assigned (user_id % 2, the offpolicy.py device),
periods split at a fixed date; the four cell means are ratios of exact
integer-cents sums from ONE aggregate.

Qini/uplift deciles: rank users by a (deterministic) targeting score,
bucket into deciles, and compare treatment-vs-control conversion per
decile plus the cumulative incremental-conversions curve (Radcliffe's
Qini). Every count is an exact integer; the per-decile and cumulative
uplifts are single divisions. The curve IS the offline evaluation of a
targeting model at 100 TB: one scan, one decile aggregate, one
cumulative window over 10 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_CUT = "2000-06-01"


def _did_oracle() -> str:
    return f"""
WITH cells AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN ts >= TIMESTAMP '{_CUT}' THEN 1 ELSE 0 END AS period,
         count(*) AS n,
         sum(cast(floor(value * 100) AS bigint)) AS cents
  FROM events GROUP BY 1, 2),
wide AS (
  SELECT max(CASE WHEN arm = 1 AND period = 0
                  THEN cast(cents AS double) / n END) AS pre_t,
         max(CASE WHEN arm = 1 AND period = 1
                  THEN cast(cents AS double) / n END) AS post_t,
         max(CASE WHEN arm = 0 AND period = 0
                  THEN cast(cents AS double) / n END) AS pre_c,
         max(CASE WHEN arm = 0 AND period = 1
                  THEN cast(cents AS double) / n END) AS post_c,
         cast(sum(n) AS bigint) AS n_events
  FROM cells)
SELECT n_events,
       round(pre_t / 100, 6) AS pre_treat,
       round(post_t / 100, 6) AS post_treat,
       round(pre_c / 100, 6) AS pre_ctrl,
       round(post_c / 100, 6) AS post_ctrl,
       round(((post_t - pre_t) - (post_c - pre_c)) / 100, 6)
         AS did_effect
FROM wide"""


@register(
    "difference_in_differences",
    oracle=_did_oracle(),
    tags=("experiment", "causal", "scale-pattern"),
)
def difference_in_differences(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """(n_events, pre/post treatment/control means, did_effect): the 2x2
    parallel-trends estimator from one four-cell aggregate (module
    docstring); ~0 on the fixture (hash arms see the same process)."""
    e = load_table(spark, sf_dir, "events")
    cells = (e.groupBy(
        F.pmod("user_id", 2).alias("arm"),
        (F.col("ts") >= F.lit(_CUT).cast("timestamp")).cast("int")
        .alias("period"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.floor(F.col("value") * 100).cast("bigint"))
             .alias("cents")))

    def cell(arm, period):
        return F.max(F.when((F.col("arm") == arm)
                            & (F.col("period") == period),
                            F.col("cents").cast("double") / F.col("n")))

    wide = cells.agg(cell(1, 0).alias("pre_t"), cell(1, 1).alias("post_t"),
                     cell(0, 0).alias("pre_c"), cell(0, 1).alias("post_c"),
                     F.sum("n").cast("long").alias("n_events"))
    return wide.select(
        "n_events",
        F.round(F.col("pre_t") / 100, 6).alias("pre_treat"),
        F.round(F.col("post_t") / 100, 6).alias("post_treat"),
        F.round(F.col("pre_c") / 100, 6).alias("pre_ctrl"),
        F.round(F.col("post_c") / 100, 6).alias("post_ctrl"),
        F.round(((F.col("post_t") - F.col("pre_t"))
                 - (F.col("post_c") - F.col("pre_c"))) / 100, 6)
        .alias("did_effect"))


def _qini_oracle() -> str:
    return """
WITH users AS (
  SELECT user_id, user_id % 2 AS treated,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         (user_id * 2654435761) % 1000 AS score
  FROM events GROUP BY user_id),
ranked AS (
  SELECT treated, conv,
         cast(floor((row_number() OVER (ORDER BY score DESC, user_id)
                     - 1.0) * 10
                    / (count(*) OVER ())) AS int) + 1 AS decile
  FROM users),
dec AS (
  SELECT decile,
         sum(treated) AS n_t, sum(treated * conv) AS c_t,
         sum(1 - treated) AS n_c, sum((1 - treated) * conv) AS c_c
  FROM ranked GROUP BY decile),
cum AS (
  SELECT decile, n_t, c_t, n_c, c_c,
         sum(c_t) OVER (ORDER BY decile) AS cum_ct,
         sum(n_t) OVER (ORDER BY decile) AS cum_nt,
         sum(c_c) OVER (ORDER BY decile) AS cum_cc,
         sum(n_c) OVER (ORDER BY decile) AS cum_nc
  FROM dec)
SELECT cast(decile AS bigint) AS decile,
       cast(n_t AS bigint) AS n_treat, cast(n_c AS bigint) AS n_ctrl,
       round(cast(c_t AS double) / nullif(n_t, 0)
             - cast(c_c AS double) / nullif(n_c, 0), 6) AS uplift,
       round(cum_ct - cast(cum_cc AS double) * cum_nt
                      / nullif(cum_nc, 0), 6) AS qini_cum
FROM cum ORDER BY decile"""


@register(
    "qini_uplift_deciles",
    oracle=_qini_oracle(),
    tags=("experiment", "causal", "evaluation", "scale-pattern"),
)
def qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_treat, n_ctrl, uplift, qini_cum): treatment-vs-control
    conversion by targeting-score decile plus the cumulative Qini curve
    (incremental conversions vs a scaled control). The score is a
    deterministic user hash, so the curve should hover near zero on the
    fixture — the MECHANISM is what the green row certifies. Deciles come
    from the explicit tile formula floor((r-1)*10/n)+1 over TWO-PHASE
    distributed ranks (not a single-partition ntile window), identical in
    the oracle; ties break on (score desc, user_id) in both engines."""
    e = load_table(spark, sf_dir, "events")
    users = (e.groupBy("user_id")
             .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("conv"))
             .select("user_id", "conv",
                     F.pmod("user_id", 2).alias("treated"),
                     F.pmod(F.col("user_id") * 2654435761, 1000)
                     .alias("score")))
    # two-phase global rank by (score desc, user_id) — auc_eval.py shape
    d = (users.repartitionByRange(32, F.desc("score"), "user_id")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    local = d.withColumn("lrank", F.row_number().over(
        W.partitionBy("pid").orderBy(F.desc("score"), "user_id")))
    offsets = (d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn("offset", F.coalesce(
                   F.sum("cnt").over(
                       W.orderBy("pid")
                       .rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))
               .withColumn("n_total", F.sum("cnt").over(
                   W.orderBy("pid").rowsBetween(W.unboundedPreceding,
                                                W.unboundedFollowing)))
               .select("pid", "offset", "n_total"))
    ranked = (local.join(F.broadcast(offsets), "pid")
              .select("treated", "conv",
                      (F.floor(((F.col("offset") + F.col("lrank") - 1.0)
                                * 10) / F.col("n_total"))
                       .cast("int") + 1).alias("decile")))
    dec = (ranked.groupBy("decile")
           .agg(F.sum("treated").alias("n_t"),
                F.sum(F.col("treated") * F.col("conv")).alias("c_t"),
                F.sum(1 - F.col("treated")).alias("n_c"),
                F.sum((1 - F.col("treated")) * F.col("conv")).alias("c_c")))
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = (dec.withColumn("cum_ct", F.sum("c_t").over(wc))
           .withColumn("cum_nt", F.sum("n_t").over(wc))
           .withColumn("cum_cc", F.sum("c_c").over(wc))
           .withColumn("cum_nc", F.sum("n_c").over(wc)))
    return (cum.select(
                F.col("decile").cast("long").alias("decile"),
                F.col("n_t").cast("long").alias("n_treat"),
                F.col("n_c").cast("long").alias("n_ctrl"),
                # nullif guards: a sparse decile (tiny fixtures) may hold
                # no treated or no control users — NULL, not an error.
                F.round(F.col("c_t").cast("double")
                        / F.nullif(F.col("n_t"), F.lit(0))
                        - F.col("c_c").cast("double")
                        / F.nullif(F.col("n_c"), F.lit(0)), 6)
                .alias("uplift"),
                F.round(F.col("cum_ct")
                        - F.col("cum_cc").cast("double")
                        * F.col("cum_nt")
                        / F.nullif(F.col("cum_nc"), F.lit(0)), 6)
                .alias("qini_cum"))
            .orderBy("decile"))
