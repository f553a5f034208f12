"""Negative-sampling distribution for skip-gram style embedding training
(Mikolov et al. 2013): draw negatives proportional to count^0.75 — the
damped-unigram compromise between unigram (hubs dominate) and uniform
(rare junk dominates). This is the table a word2vec/contrastive trainer
broadcasts to every worker; building it is one count aggregate plus
map-side arithmetic, so the corpus is scanned exactly once at any scale.

Float discipline: pow(c, 0.75) is the one transcendental; it is snapped
ONCE to the micro lattice (cast(round(pow * 1e6) as bigint) — the
micro-nat pattern), so the normalizing total is an exact integer sum and
every probability is a single division of exact integers, rounded once.
The top-30 cut ranks on the exact count with token tiebreak — float
noise cannot reorder it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_TOP = 30

_NS_ORACLE = f"""
WITH cnt AS (SELECT tok, cast(count(*) AS bigint) AS c
             FROM (SELECT unnest(string_split(text, ' ')) AS tok
                   FROM documents)
             WHERE tok <> '' GROUP BY tok),
w AS (SELECT tok, c,
             cast(round(pow(c, 0.75) * 1e6) AS bigint) AS weight_micro
      FROM cnt),
tot AS (SELECT sum(weight_micro) AS t FROM w)
SELECT tok, c AS count, weight_micro,
       round(cast(weight_micro AS double) / (SELECT t FROM tot), 8)
         AS neg_prob
FROM w ORDER BY count DESC, tok LIMIT {_TOP}"""


@register(
    "skipgram_negative_sampling_table",
    oracle=_NS_ORACLE,
    tags=("language-model", "sampling", "features"),
)
def skipgram_negative_sampling_table(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Top-{_TOP} rows of the count^0.75 negative-sampling table with each
    token's normalized draw probability (normalizer = the WHOLE vocabulary,
    computed before the cut — module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    cnt = (d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
           .filter(F.col("tok") != "")
           .groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = cnt.withColumn(
        "weight_micro",
        F.round(F.pow(F.col("c"), F.lit(0.75)) * 1e6).cast("long"))
    tot = w.agg(F.sum("weight_micro").alias("t"))
    return (w.crossJoin(F.broadcast(tot))
            .select(F.col("tok"), F.col("c").alias("count"), "weight_micro",
                    F.round(F.col("weight_micro").cast("double")
                            / F.col("t"), 8).alias("neg_prob"))
            .orderBy(F.col("count").desc(), "tok")
            .limit(_TOP))
