"""MinHash ESTIMATOR-ERROR audit: per candidate pair, the Jaccard estimate
implied by the signatures (matching minhash components / K) next to the
exact Jaccard — the other half of trusting LSH at scale. lsh_recall_vs_exact
(dedup.py) measures what the BANDING misses; this measures how far the
ESTIMATOR itself is from truth on the pairs it does surface (theory:
matches ~ Binomial(K, J), so |est − J| concentrates at ~sqrt(J(1−J)/16) ≈
0.12 — the audit shows the real distribution instead of quoting it).

All integer/rank arithmetic: component matches are exact equalities of the
cross-engine-identical minhash values (functions/hashing.py md5
convention), exact Jaccard comes from the array-intersect verify path, and
both are rounded at 6 dp as true quotients — bitwise agreement.

Scale: signatures are ONE groupBy over exploded shingles; the estimate is
a map-side zip of two 16-value signature rows per CANDIDATE pair (LSH
candidates are near-linear in corpus size, see dedup.py) — the audit adds
one broadcast-sized join on top of the dedup pipeline it audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import (MERSENNE_P, MINHASH_A, MINHASH_B, MINHASH_K,
                                 md5_mod_duck, md5_mod_spark)
from ..registry import register
from .dedup import _A_LIST, _B_LIST, lsh_candidates
from .shingles import (_TG_CTE_DUCK, _doc_trigram_sets, _doc_trigrams)


@register(
    "minhash_estimator_error",
    oracle=f"""
WITH {_TG_CTE_DUCK},
hs AS (SELECT doc_id, {md5_mod_duck("tg")} AS h FROM t),
params AS (SELECT unnest(range({MINHASH_K})) AS k,
                  unnest([{_A_LIST}]) AS a,
                  unnest([{_B_LIST}]) AS b),
sig AS (SELECT doc_id, k, min((a * h + b) % {MERSENNE_P}) AS m
        FROM hs, params GROUP BY doc_id, k),
bands AS (SELECT doc_id, k // 4 AS band,
                 string_agg(cast(m AS varchar), '_' ORDER BY k) AS bkey
          FROM sig GROUP BY doc_id, k // 4),
cand AS (SELECT DISTINCT x.doc_id d1, y.doc_id d2
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
est AS (SELECT c.d1, c.d2,
               sum(CASE WHEN s1.m = s2.m THEN 1 ELSE 0 END) AS n_match
        FROM cand c JOIN sig s1 ON s1.doc_id = c.d1
                    JOIN sig s2 ON s2.doc_id = c.d2 AND s2.k = s1.k
        GROUP BY c.d1, c.d2),
sz AS (SELECT doc_id, count(*) n FROM t GROUP BY doc_id),
inter AS (SELECT c.d1, c.d2, count(*) AS i
          FROM cand c JOIN t a ON a.doc_id = c.d1
                      JOIN t b ON b.doc_id = c.d2 AND b.tg = a.tg
          GROUP BY c.d1, c.d2),
ex AS (SELECT c.d1, c.d2,
              round(coalesce(i.i, 0) * 1.0
                    / (z1.n + z2.n - coalesce(i.i, 0)), 6) AS exact_j
       FROM cand c LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
            JOIN sz z1 ON z1.doc_id = c.d1 JOIN sz z2 ON z2.doc_id = c.d2)
SELECT e.d1, e.d2,
       cast(e.n_match AS bigint) AS n_match,
       round(e.n_match / {MINHASH_K}.0, 6) AS est_j,
       x.exact_j,
       round(abs(e.n_match / {MINHASH_K}.0 - x.exact_j), 6) AS abs_err
FROM est e JOIN ex x ON x.d1 = e.d1 AND x.d2 = e.d2
ORDER BY e.d1, e.d2""",
    tags=("dedup", "lsh", "evaluation"),
)
def minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LSH-candidate-pair: matching signature components, the implied
    Jaccard estimate (matches/{MINHASH_K}), the exact Jaccard, and the
    absolute estimator error — the audit read before trusting signature
    agreement as a similarity score downstream (e.g. dedup thresholds set
    on estimates rather than verified values)."""
    tg = _doc_trigrams(spark, sf_dir)
    hs = tg.select("doc_id", F.expr(md5_mod_spark("tg")).alias("h"))
    sig = hs.groupBy("doc_id").agg(*[
        F.min((F.lit(MINHASH_A[k]) * F.col("h") + F.lit(MINHASH_B[k]))
              % MERSENNE_P).alias(f"m{k}")
        for k in range(MINHASH_K)
    ]).localCheckpoint(eager=False)   # feeds both sides of the pair join
    cand = lsh_candidates(tg)
    s1 = sig.select(F.col("doc_id").alias("d1"),
                    *[F.col(f"m{k}").alias(f"a{k}")
                      for k in range(MINHASH_K)])
    s2 = sig.select(F.col("doc_id").alias("d2"),
                    *[F.col(f"m{k}").alias(f"b{k}")
                      for k in range(MINHASH_K)])
    n_match = sum(F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
                  for k in range(MINHASH_K))
    est = (cand.join(s1, "d1").join(s2, "d2")
           .select("d1", "d2", n_match.cast("bigint").alias("n_match")))
    sets = _doc_trigram_sets(spark, sf_dir)
    a1 = sets.select(F.col("doc_id").alias("d1"),
                     F.col("tgs").alias("tgs1"), F.col("n").alias("n1"))
    a2 = sets.select(F.col("doc_id").alias("d2"),
                     F.col("tgs").alias("tgs2"), F.col("n").alias("n2"))
    i = F.size(F.array_intersect("tgs1", "tgs2"))
    exact = (cand.join(a1, "d1").join(a2, "d2")
             .select("d1", "d2",
                     F.round(i / (F.col("n1") + F.col("n2") - i), 6)
                     .alias("exact_j")))
    return (est.join(exact, ["d1", "d2"])
            .select("d1", "d2", "n_match",
                    F.round(F.col("n_match") / MINHASH_K, 6).alias("est_j"),
                    "exact_j",
                    F.round(F.abs(F.col("n_match") / MINHASH_K
                                  - F.col("exact_j")), 6).alias("abs_err"))
            .orderBy("d1", "d2"))
