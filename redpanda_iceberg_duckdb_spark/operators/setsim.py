"""Exact set-similarity join via prefix filtering (PPJoin-style, public:
Xiao et al., "Efficient Similarity Joins for Near Duplicate Detection",
WWW 2008) — the EXACT counterpart to the MinHash-LSH candidate path in
dedup.py.

The filter theorem: order the token universe globally (here by ascending
document frequency, rarest first, ties by token text) and sort every
document's token set by that order. For Jaccard threshold t, if
J(A, B) >= t then A and B must share at least one token among the first

    p(X) = |X| - ceil(t · |X|) + 1

tokens of each (their "prefixes"). So candidate generation only joins on
PREFIX tokens — and because the prefix is taken from the RARE end of the
ordering, the equi-join keys are low-frequency by construction: the hot
stopword-like tokens that would dominate an all-token self-join never
enter the join at all. That is the same hot-key argument as the LSH
df-cap, but with zero loss — the result set is provably every pair with
J >= t, which is why the ORACLE here is the brute-force all-pairs join:
agreement proves the prefix filter drops nothing.

Scale stance (100 TB):
- No global rank is materialized: the ordering key is the PAIR (df, tok)
  itself, so per-doc prefix selection is an array sort of that doc's own
  (df, tok) structs — map-side after one token-keyed df join; no
  single-partition window anywhere.
- Candidate pruning: pairs also must satisfy the length filter
  t·|A| <= |B| (cross-multiplied in integers — no float threshold edge),
  applied before verification.
- Verification is the doc-set array-intersect pattern shared with the LSH
  path (shingles._jaccard_verified rationale): candidate-pair cost only,
  never a corpus-wide shuffle.
- Cost vs LSH: prefix filtering is exact but its candidate count grows
  with token-frequency skew; LSH is constant-work per doc but
  probabilistic. A production pipeline runs LSH for recall-tolerant dedup
  and PPJoin for the contracts that need exactness (this repo ships
  both, plus the measured recall gap: lsh_recall_vs_exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .shingles import _TG_CTE_DUCK, _doc_trigram_sets, _doc_trigrams

_T_NUM, _T_DEN = 7, 10     # Jaccard threshold t = 0.7, kept as a ratio

_ORACLE = f"""
WITH {_TG_CTE_DUCK},
sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
          FROM t a JOIN t b ON a.tg = b.tg AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT d1, d2, i, s1.n AS n1, s2.n AS n2
      FROM inter JOIN sz s1 ON s1.doc_id = d1
                 JOIN sz s2 ON s2.doc_id = d2)
SELECT d1, d2, round(i * 1.0 / (n1 + n2 - i), 6) AS jaccard
FROM j WHERE {_T_DEN} * i >= {_T_NUM} * (n1 + n2 - i)
ORDER BY d1, d2"""


@register(
    "ppjoin_exact_pairs",
    oracle=_ORACLE,
    tags=("dedup", "similarity-join", "exact"),
)
def ppjoin_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document pair with trigram-set Jaccard >= 0.7, EXACTLY, via
    prefix-filtered candidate generation (module docstring has the filter
    theorem and why the join never touches hot tokens). The oracle is the
    brute-force all-pairs join — agreement proves zero false negatives."""
    tg = _doc_trigrams(spark, sf_dir)
    dfreq = tg.groupBy("tg").agg(F.count(F.lit(1)).alias("df"))
    # Per-doc prefix: sort this doc's (df, tg) pairs rarest-first map-side,
    # keep the first n - ceil(t*n) + 1. ceil(7n/10) in integers.
    ordered = (tg.join(dfreq, "tg")
               .groupBy("doc_id")
               .agg(F.sort_array(F.collect_list(F.struct("df", "tg")))
                     .alias("ord"),
                    F.count(F.lit(1)).alias("n")))
    prefix = (ordered.select(
        "doc_id", "n",
        F.explode(F.expr(
            f"slice(ord, 1, n - (({_T_NUM} * n + {_T_DEN} - 1) "
            f"div {_T_DEN}) + 1)")).alias("o"))
        .select("doc_id", "n", F.col("o.tg").alias("tg")))
    pa = prefix.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"),
                       "tg")
    pb = prefix.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"),
                       "tg")
    cand = (pa.join(pb, "tg")
            .filter(F.col("d1") < F.col("d2"))
            # length filter: t·max(n1,n2) <= min(n1,n2), in integers
            .filter(_T_DEN * F.least("n1", "n2")
                    >= _T_NUM * F.greatest("n1", "n2"))
            .select("d1", "d2").distinct())
    sets = _doc_trigram_sets(spark, sf_dir)
    a1 = sets.select(F.col("doc_id").alias("d1"),
                     F.col("tgs").alias("tgs1"), F.col("n").alias("n1"))
    d2docs = cand.select(F.col("d2").alias("doc_id")).distinct()
    # No broadcast hints here: the candidate-pair set grows with corpus
    # size (near-linearly under the prefix filter, but unbounded), so a
    # hard-coded F.broadcast would OOM the driver at scale. These are plain
    # equi-joins on d1/d2 — AQE converts them to broadcast joins at runtime
    # whenever the built side is actually under the threshold, which is the
    # size-gated behavior a 100 TB run needs.
    a2 = (sets.join(d2docs, "doc_id")
          .select(F.col("doc_id").alias("d2"),
                  F.col("tgs").alias("tgs2"), F.col("n").alias("n2")))
    i = F.size(F.array_intersect("tgs1", "tgs2"))
    return (cand.join(a1, "d1").join(a2, "d2")
            .withColumn("i", i)
            .filter(_T_DEN * F.col("i")
                    >= _T_NUM * (F.col("n1") + F.col("n2") - F.col("i")))
            .select("d1", "d2",
                    F.round(F.col("i") / (F.col("n1") + F.col("n2")
                                          - F.col("i")), 6).alias("jaccard"))
            .orderBy("d1", "d2"))
