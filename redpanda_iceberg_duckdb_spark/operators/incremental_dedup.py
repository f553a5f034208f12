"""Incremental near-duplicate detection: dedup a NEW ingest batch against
the existing corpus without re-comparing the corpus to itself — the shape
every daily-ingest training-data pipeline actually runs (full-corpus dedup
is a backfill job; steady state is new-vs-all).

The restriction is applied at the CANDIDATE JOIN, not as a post-filter:
the left side of the (band, bkey) equi-join is only the new batch's band
rows, so join work — and everything downstream (verification) — scales
with |new| x bucket-density, not |corpus|². Old x old pairs are never
generated, not generated-then-discarded. Signatures for the existing
corpus would be PRECOMPUTED and stored in production (they are
content-addressed and immutable); here both sides derive from one
lsh_bands call so the oracle can replay the arithmetic.

Demo batch: doc_id % 10 == 0 plays the "newly ingested" slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .dedup import _LSH_CAND_CTE_DUCK, lsh_bands
from .shingles import (_JACCARD_VERIFY_DUCK, _TG_CTE_DUCK, _doc_trigram_sets,
                       _doc_trigrams, _jaccard_verified)

_NEW_PRED = "doc_id % 10 = 0"


@register(
    "incremental_dedup_new_batch",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_LSH_CAND_CTE_DUCK},
icand AS (SELECT d1, d2 FROM cand
          WHERE d1 % 10 = 0 OR d2 % 10 = 0),
{_JACCARD_VERIFY_DUCK.format(
    cand_filter="JOIN icand ON icand.d1 = a.doc_id AND icand.d2 = b.doc_id")}
SELECT d1, d2, jaccard,
       (d1 % 10 = 0 AND d2 % 10 = 0) AS both_new
FROM jac WHERE jaccard >= 0.5 ORDER BY d1, d2""",
    tags=("dedup", "lsh", "incremental"),
)
def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Near-dup pairs (exact Jaccard >= 0.5) where at least one side is in
    the new ingest batch — candidates from the band join of (new bands) x
    (all bands), so old x old work never exists; `both_new` separates
    batch-internal dups from collisions with the standing corpus (the two
    get different treatment: internal dups drop, corpus collisions mark
    the NEW doc). Module docstring has the incremental-cost argument."""
    tg = _doc_trigrams(spark, sf_dir)
    bands = lsh_bands(tg)
    new_side = (bands.filter(F.expr(_NEW_PRED))
                .select(F.col("doc_id").alias("a"), "band", "bkey"))
    all_side = bands.select(F.col("doc_id").alias("b"), "band", "bkey")
    cand = (new_side.join(all_side, ["band", "bkey"])
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("d1"),
                    F.greatest("a", "b").alias("d2"))
            .distinct())
    verified = _jaccard_verified(tg, cand, 0.5,
                                 doc_sets=_doc_trigram_sets(spark, sf_dir))
    return (verified.select(
        "d1", "d2", "jaccard",
        ((F.col("d1") % 10 == 0) & (F.col("d2") % 10 == 0))
        .alias("both_new"))
        .orderBy("d1", "d2"))
