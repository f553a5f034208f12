"""Average precision (area under the precision-recall curve at the
operating points) for a ranked retrieval/classification list — the eval
metric the AUC family (auc_mann_whitney, ndcg_at_10, ece bins) still
lacked. Users are ranked by engagement score (view+click count, user_id
tiebreak); the positive label is "made a purchase of value >= 250".

Scale design — NO global single-partition sort: ranks come from the
two-phase pattern (cf. stable_row_ids_two_phase). Scores are small
integers, so the score histogram is tiny; cumulative user/positive counts
above each score become broadcast offsets, and within-score ranks are a
window PARTITIONED BY score — every score group ranks independently in
parallel. Global rank k = offset(score) + local rank; cumulative positives
cp likewise. The offsets window runs over histogram rows (KBs), never over
users.

Exactness: AP = (1/P) * sum over positives of cp/k is a float sum in the
naive form — order-dependent. Each term is snapped to the exact nano
lattice with INTEGER division ((cp * 1e9) div k) so the sum is an integer
and the single final division is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_AP_ORACLE = """
WITH u AS (SELECT user_id,
                  cast(sum(CASE WHEN event_type IN ('view', 'click')
                                THEN 1 ELSE 0 END) AS bigint) AS score,
                  max(CASE WHEN event_type = 'purchase' AND value >= 250
                           THEN 1 ELSE 0 END) AS pos
           FROM events GROUP BY 1),
r AS (SELECT pos,
             row_number() OVER (ORDER BY score DESC, user_id) AS k,
             sum(pos) OVER (ORDER BY score DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cp
      FROM u)
SELECT cast(count(*) AS bigint) AS n_users,
       cast(sum(pos) AS bigint) AS n_pos,
       round(cast(sum(CASE WHEN pos = 1 THEN (cp * 1000000000) // k
                           ELSE 0 END) AS double)
             / cast(sum(pos) AS double) / 1e9, 6) AS average_precision,
       round(cast(sum(CASE WHEN k <= 50 THEN pos ELSE 0 END) AS double)
             / 50, 6) AS p_at_50,
       round(cast(sum(CASE WHEN k <= 50 THEN pos ELSE 0 END) AS double)
             / cast(sum(pos) AS double), 6) AS r_at_50
FROM r"""


@register(
    "average_precision_purchases",
    oracle=_AP_ORACLE,
    tags=("eval", "ranking", "scale-pattern"),
)
def average_precision_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision + precision/recall@50 of the engagement-ranked
    user list against the high-value-purchase label, ranks assigned by the
    two-phase score-histogram plan (module docstring). The oracle is the
    naive global-window form, so a green row proves the distributed rank
    assignment is exactly the sequential one."""
    ev = load_table(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.sum(F.when(F.col("event_type").isin("view", "click"), 1)
                    .otherwise(0)).cast("long").alias("score"),
              F.max(F.when((F.col("event_type") == "purchase")
                           & (F.col("value") >= 250), 1).otherwise(0))
               .alias("pos")))
    hist = (u.groupBy("score")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pcnt")))
    # Cumulative counts of users / positives at STRICTLY HIGHER scores —
    # a window over histogram rows (distinct scores), kilobytes of data.
    wofs = W.orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, -1)
    offsets = hist.select(
        "score",
        F.coalesce(F.sum("cnt").over(wofs), F.lit(0)).alias("k_off"),
        F.coalesce(F.sum("pcnt").over(wofs), F.lit(0)).alias("cp_off"))
    wloc = W.partitionBy("score").orderBy("user_id")
    ranked = (u.join(F.broadcast(offsets), "score")
              .select(
                  "pos",
                  (F.col("k_off")
                   + F.row_number().over(wloc)).cast("long").alias("k"),
                  (F.col("cp_off")
                   + F.sum("pos").over(
                       wloc.rowsBetween(W.unboundedPreceding, 0)))
                  .cast("long").alias("cp")))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.round(F.sum(F.when(F.col("pos") == 1,
                             F.expr("(cp * 1000000000) div k"))
                      .otherwise(F.lit(0))).cast("double")
                / F.sum("pos").cast("double") / 1e9, 6)
         .alias("average_precision"),
        F.round(F.sum(F.when(F.col("k") <= 50, F.col("pos"))
                      .otherwise(F.lit(0))).cast("double") / 50, 6)
         .alias("p_at_50"),
        F.round(F.sum(F.when(F.col("k") <= 50, F.col("pos"))
                      .otherwise(F.lit(0))).cast("double")
                / F.sum("pos").cast("double"), 6).alias("r_at_50"))
