"""Exact ROC AUC via the Mann-Whitney rank-sum identity — the binary-
classifier evaluation every quality-filter / relevance-model offline
loop needs at corpus scale:

    AUC = (R_pos - n_pos (n_pos + 1) / 2) / (n_pos * n_neg)

where R_pos is the sum of the positives' ranks in the pooled score
order. No pairwise comparison (the naive definition is n_pos x n_neg
pairs); one ranking pass and one aggregate.

Scale stance: the pooled rank is the only nontrivial cost and it uses
the two-phase distributed ranking (range exchange on the score -> local
ranks in parallel -> broadcast partition offsets), NOT a
single-partition global row_number. The rank sum is an exact integer, so
both engines agree bit-for-bit before the single final quotient. Ties
are broken by (score, event_id) identically in both engines — with
continuous scores this equals the standard AUC almost surely, and under
ties it is a deterministic, engine-independent convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_N_RANGE_PARTS = 32


def _oracle() -> str:
    return """
WITH scored AS (
  SELECT value AS score, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events),
ranked AS (
  SELECT pos, row_number() OVER (ORDER BY score, event_id) AS r
  FROM scored)
SELECT cast(sum(pos) AS bigint) AS n_pos,
       cast(count(*) - sum(pos) AS bigint) AS n_neg,
       round((cast(sum(CASE WHEN pos = 1 THEN r ELSE 0 END) AS double)
              - cast(sum(pos) AS double) * (sum(pos) + 1) / 2)
             / (cast(sum(pos) AS double)
                * (count(*) - sum(pos))), 6) AS auc
FROM ranked"""


@register(
    "auc_mann_whitney",
    oracle=_oracle(),
    tags=("evaluation", "ranking", "scale-pattern"),
)
def auc_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_pos, n_neg, auc) for `value` as a score predicting
    event_type = 'purchase'. The oracle uses a plain global row_number,
    so a green row proves the two-phase ranking and the rank-sum algebra
    reproduce the sequential AUC exactly."""
    scored = (load_table(spark, sf_dir, "events")
              .select(F.col("value").alias("score"), "event_id",
                      F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0).alias("pos")))
    d = (scored.repartitionByRange(_N_RANGE_PARTS, "score", "event_id")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))
    local = d.withColumn("lrank", F.row_number().over(
        W.partitionBy("pid").orderBy("score", "event_id")))
    offsets = (d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn("offset", F.coalesce(
                   F.sum("cnt").over(
                       W.orderBy("pid")
                       .rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("pid", "offset"))
    ranked = (local.join(F.broadcast(offsets), "pid")
              .select("pos", (F.col("offset") + F.col("lrank")).alias("r")))
    npos = F.sum("pos")
    auc = ((F.sum(F.when(F.col("pos") == 1, F.col("r")).otherwise(0))
            .cast("double")
            - npos.cast("double") * (npos + 1) / 2)
           / (npos.cast("double") * (F.count(F.lit(1)) - npos)))
    return ranked.agg(npos.cast("long").alias("n_pos"),
                      (F.count(F.lit(1)) - npos).cast("long").alias("n_neg"),
                      F.round(auc, 6).alias("auc"))
