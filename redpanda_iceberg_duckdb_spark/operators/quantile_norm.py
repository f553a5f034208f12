"""Quantile normalization (Bolstad et al., Bioinformatics 2003,
generalized to unequal group sizes) — force every group's distribution
of a metric onto the POOLED distribution, the batch-effect correction
used to make scores comparable across sources/models/annotators before
mixing their data.

Each row's value is replaced by the pooled order statistic at its
group-relative rank: r-th of n_g in its group -> pooled element
k = round(((r - 0.5) / n_g) * N), computed in EXACT integer arithmetic
(k = ((2r-1)N + n_g) // (2 n_g), clamped to [1, N]) so both engines pick
the identical pooled element — no float quantile interpolation anywhere.

Scale stance: the group-relative rank is a window sort WITHIN each group
partition. The pooled rank is the expensive part — a naive row_number()
over everything is a single-partition global sort, so it uses the
two-phase distributed ranking instead (scale8/training_order pattern):
repartitionByRange on the sort key -> per-partition local ranks in
parallel -> broadcast cumulative offsets. One range exchange, one tiny
broadcast, and the final map from rank k to its value is an equi-join
shuffled by k. Total ties are broken by (value, event_id), so every rank
is unique and the mapping is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_N_RANGE_PARTS = 32


def _oracle() -> str:
    return """
WITH v AS (
  SELECT event_id, event_type, value FROM events),
grouped AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS ng
  FROM v),
pooled AS (
  SELECT value AS pooled_value,
         row_number() OVER (ORDER BY value, event_id) AS k
  FROM v),
total AS (SELECT count(*) AS n FROM v)
SELECT g.event_id, g.event_type, g.value,
       p.pooled_value AS norm_value
FROM grouped g, total t
JOIN pooled p
  ON p.k = least(t.n, greatest(1, ((2 * g.r - 1) * t.n + g.ng)
                                  // (2 * g.ng)))
ORDER BY event_id"""


@register(
    "quantile_normalize_by_type",
    oracle=_oracle(),
    tags=("normalization", "scale-pattern", "two-phase-rank"),
)
def quantile_normalize_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, value, norm_value) where norm_value is the
    pooled order statistic at the row's within-type quantile position.
    The oracle uses plain global row_numbers, so a green row proves the
    two-phase pooled ranking and the integer position mapping reproduce
    the sequential semantics exactly."""
    v = (load_table(spark, sf_dir, "events")
         .select("event_id", "event_type", "value"))

    grouped = (v
               .withColumn("r", F.row_number().over(
                   W.partitionBy("event_type").orderBy("value", "event_id")))
               .withColumn("ng", F.count(F.lit(1)).over(
                   W.partitionBy("event_type"))))

    # Two-phase global rank of the pooled values (no single-partition sort).
    d = (v.repartitionByRange(_N_RANGE_PARTS, "value", "event_id")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))  # both phases share one pid view
    local = d.withColumn("lrank", F.row_number().over(
        W.partitionBy("pid").orderBy("value", "event_id")))
    offsets = (d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn("offset", F.coalesce(
                   F.sum("cnt").over(
                       W.orderBy("pid")
                       .rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("pid", "offset"))
    pooled = (local.join(F.broadcast(offsets), "pid")
              .select((F.col("offset") + F.col("lrank")).alias("k"),
                      F.col("value").alias("pooled_value")))

    n_total = v.agg(F.count(F.lit(1)).alias("n"))
    pos = F.least(
        F.col("n"),
        F.greatest(F.lit(1).cast("long"),
                   F.expr("((2 * r - 1) * n + ng) div (2 * ng)")))
    return (grouped.crossJoin(F.broadcast(n_total))
            .withColumn("k", pos)
            .join(pooled, "k")
            .select("event_id", "event_type", "value",
                    F.col("pooled_value").alias("norm_value"))
            .orderBy("event_id"))
