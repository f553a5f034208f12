"""Pointwise mutual information over adjacent-token co-occurrences
(Church & Hanks 1990) — the collocation statistic behind phrase mining
and word-embedding preprocessing (word2vec's subsampling/negatives and
GloVe's co-occurrence matrix both start here).

PMI(x, y) = ln[ (c_xy / Np) / ((c_x / Nu)(c_y / Nu)) ]
          = ln[ c_xy * Nu^2 / (Np * c_x * c_y) ]

— one ln of a ratio of exact integer counts, so cross-engine determinism
reduces to the established ln precedent (lexicon.py), and ranking uses
the rounded value with a token tie-break.

Scale stance: bigrams are built INSIDE the row with zip_with over the
token array (no positional self-join, no shuffle to form pairs); the two
count tables are map-side-combinable aggregates; the unigram counts
broadcast back onto the (pair)-aggregate. min-count >= 5 prunes the
hapax tail before the join. At 100 TB this is exactly the GloVe
co-occurrence-count pass, one scan + two aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_MIN_PAIR = 5
_K = 20


def _oracle() -> str:
    return f"""
WITH arrs AS (SELECT string_split(text, ' ') AS a FROM documents),
uni AS (SELECT unnest(a) AS w FROM arrs),
cu AS (SELECT w, count(*) c FROM uni WHERE w <> '' GROUP BY w),
nu AS (SELECT sum(c) n FROM cu),
big AS (SELECT [least(a[i], a[i+1]) || ' ' || greatest(a[i], a[i+1])
                FOR i IN range(1, len(a))] AS ps
        FROM arrs),
pairs AS (SELECT unnest(ps) AS p FROM big),
cp AS (SELECT string_split(p, ' ')[1] AS w1, string_split(p, ' ')[2] AS w2,
              count(*) c
       FROM pairs WHERE p NOT LIKE ' %' AND p NOT LIKE '% ' GROUP BY 1, 2),
np AS (SELECT sum(c) n FROM cp),
pmi AS (SELECT cp.w1, cp.w2, cp.c,
               ln(cast(cp.c AS double) * (SELECT n FROM nu)
                  * (SELECT n FROM nu)
                  / (cast((SELECT n FROM np) AS double) * u1.c * u2.c))
                 AS v
        FROM cp JOIN cu u1 ON u1.w = cp.w1 JOIN cu u2 ON u2.w = cp.w2
        WHERE cp.c >= {_MIN_PAIR})
SELECT w1, w2, cast(c AS bigint) AS n_cooccur, round(v, 6) AS pmi
FROM pmi ORDER BY round(v, 6) DESC, w1, w2 LIMIT {_K}"""


@register(
    "pmi_collocations_topk",
    oracle=_oracle(),
    tags=("text", "collocation", "scale-pattern"),
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, n_cooccur, pmi): the 20 strongest adjacent-token
    collocations in the corpus by PMI, pairs with support >= 5 (module
    docstring). Bigrams form row-locally via zip_with — no join builds
    pairs; empty-token edges (leading/trailing splits) are excluded on
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    arrs = docs.select(F.split("text", " ").alias("a"))
    uni = arrs.select(F.explode("a").alias("w")).filter(F.col("w") != "")
    cu = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = cu.agg(F.sum("c").alias("nu"))
    big = arrs.select(F.explode(F.expr(
        "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1), "
        "(x, y) -> struct(least(x, y) AS w1, greatest(x, y) AS w2))"))
        .alias("p")).select("p.w1", "p.w2")
    cp = (big.filter((F.col("w1") != "") & (F.col("w2") != ""))
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
          .filter(F.col("c") >= _MIN_PAIR))
    np_ = (big.filter((F.col("w1") != "") & (F.col("w2") != ""))
           .agg(F.count(F.lit(1)).alias("np")))
    pmi = (cp
           .join(F.broadcast(cu.select(F.col("w").alias("w1"),
                                       F.col("c").alias("c1"))), "w1")
           .join(F.broadcast(cu.select(F.col("w").alias("w2"),
                                       F.col("c").alias("c2"))), "w2")
           .crossJoin(F.broadcast(nu)).crossJoin(F.broadcast(np_))
           .select("w1", "w2", F.col("c").cast("long").alias("n_cooccur"),
                   F.round(F.log(
                       F.col("c").cast("double") * F.col("nu") * F.col("nu")
                       / (F.col("np").cast("double") * F.col("c1")
                          * F.col("c2"))), 6).alias("pmi")))
    return pmi.orderBy(F.desc("pmi"), "w1", "w2").limit(_K)
