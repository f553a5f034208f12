"""Out-of-fold target encoding — the leakage-safe categorical encoder
(Micci-Barreca, SIGKDD Explorations 2001, with the K-fold discipline
every gradient-boosting pipeline uses): replace a categorical key with a
smoothed mean of the target, computed for each row WITHOUT that row's
own fold, so the feature never sees its own label.

For fold f of key k (target sums S, counts N):

    enc(k, f) = (S_k - S_{k,f} + m * g_f) / (N_k - N_{k,f} + m)
    g_f       = (S_tot - S_f) / (N_tot - N_f)     (prior, also fold-free)

Scale stance: ONE hash aggregate to (key, fold) grain — everything else
is algebraic recombination of those sufficient statistics (the
loo_source_ablation pattern with two marginalizations), so K folds cost
one scan, not K. The (key, fold) table is vocabulary-sized; its window
marginals are over #keys x #folds rows, never data rows. Fold assignment
is a seeded hash (coordination-free, reproducible on any worker);
target sums are integers, so both engines agree exactly before the one
final quotient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_FOLDS = 5
_SMOOTH = 20  # prior strength m


def _oracle() -> str:
    fold = md5_mod_duck("'fold:' || cast(o_orderkey AS varchar)", _FOLDS)
    return f"""
WITH cells AS (
  SELECT o_orderpriority AS key, {fold} AS fold,
         count(*) AS n,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS s
  FROM orders GROUP BY 1, 2),
marg AS (
  SELECT key, fold, n, s,
         sum(n) OVER (PARTITION BY key) AS n_key,
         sum(s) OVER (PARTITION BY key) AS s_key,
         sum(n) OVER (PARTITION BY fold) AS n_fold,
         sum(s) OVER (PARTITION BY fold) AS s_fold,
         sum(n) OVER () AS n_tot,
         sum(s) OVER () AS s_tot
  FROM cells)
SELECT key, cast(fold AS bigint) AS fold, cast(n AS bigint) AS n_in_fold,
       round((cast(s_key - s AS double)
              + {_SMOOTH} * (cast(s_tot - s_fold AS double)
                             / (n_tot - n_fold)))
             / (n_key - n + {_SMOOTH}), 6) AS encoding
FROM marg
ORDER BY key, fold"""


@register(
    "target_encoding_oof",
    oracle=_oracle(),
    tags=("feature-engineering", "leakage", "scale-pattern"),
)
def target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (key, fold) -> encoding table for o_orderpriority against the
    binary target o_orderstatus = 'F', hash-folded on o_orderkey and
    smoothed toward the fold-free global rate. A green row proves the
    fold hash, the double marginalization, and the smoothing algebra all
    agree; leakage-freedom is structural (the row's own fold never
    appears in its numerator or denominator)."""
    fold = F.expr(md5_mod_spark(
        "concat('fold:', cast(o_orderkey as string))", _FOLDS))
    cells = (load_table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderpriority").alias("key"),
                      fold.alias("fold"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.when(F.col("o_orderstatus") == "F", 1)
                        .otherwise(0)).alias("s")))
    marg = (cells
            .withColumn("n_key", F.sum("n").over(W.partitionBy("key")))
            .withColumn("s_key", F.sum("s").over(W.partitionBy("key")))
            .withColumn("n_fold", F.sum("n").over(W.partitionBy("fold")))
            .withColumn("s_fold", F.sum("s").over(W.partitionBy("fold")))
            .withColumn("n_tot", F.sum("n").over(
                W.partitionBy(F.lit(1))))
            .withColumn("s_tot", F.sum("s").over(
                W.partitionBy(F.lit(1)))))
    g_f = (F.col("s_tot") - F.col("s_fold")).cast("double") \
        / (F.col("n_tot") - F.col("n_fold"))
    enc = ((F.col("s_key") - F.col("s")).cast("double") + _SMOOTH * g_f) \
        / (F.col("n_key") - F.col("n") + _SMOOTH)
    return (marg.select("key", F.col("fold").cast("long").alias("fold"),
                        F.col("n").cast("long").alias("n_in_fold"),
                        F.round(enc, 6).alias("encoding"))
            .orderBy("key", "fold"))
