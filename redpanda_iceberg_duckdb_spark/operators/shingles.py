"""Shared shingling + exact-Jaccard building blocks used by the dedup
operator family (dedup.py) and cluster resolution (clusters.py).

Lives in its own module so importers get the helpers WITHOUT triggering
query registration — registration order is the driver's correctness-window
order, and helper imports must not perturb it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table

# Word-trigram shingles, deduplicated per doc. The split array is
# materialized once per row (ws) — inlining split(text) into the transform
# lambda would re-split the document per element (O(len^2) per doc).
_TG_ARRAY_SPARK = (
    "case when size(ws) >= 3 then "
    "transform(sequence(0, size(ws) - 3), i -> "
    "concat_ws(' ', ws[i], ws[i + 1], ws[i + 2])) "
    "else array() end"
)

_TG_CTE_DUCK = """
w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
t AS (SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS tg
      FROM w, unnest(range(greatest(len(ws) - 2, 0))) r(i))
"""


def _doc_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", F.split("text", " ").alias("ws"))
            .select("doc_id", F.explode(F.expr(_TG_ARRAY_SPARK)).alias("tg"))
            .distinct())


def _jaccard_verified(tg: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs (d1 < d2): |A∩B| / |A∪B|.

    Cost scales with |cand| x shingles-per-doc, NOT with the all-pairs
    shared-shingle join: candidates (small after LSH) broadcast onto d1's
    shingles, then one equi-join on (d2, tg) intersects with d2's shingles.
    """
    sz = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    d1_shingles = F.broadcast(cand).join(
        tg.select(F.col("doc_id").alias("d1"), "tg"), "d1")
    shared = (
        d1_shingles
        .join(tg.select(F.col("doc_id").alias("d2"), "tg"), ["d2", "tg"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _jaccard_from_shared(shared, sz, threshold)


def _jaccard_from_shared(shared: DataFrame, sz: DataFrame,
                         threshold: float) -> DataFrame:
    return (
        shared
        .join(sz.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sz.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
        .select("d1", "d2",
                F.round(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")), 6)
                .alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


_JACCARD_VERIFY_DUCK = """
sz AS (SELECT doc_id, count(*) n FROM t GROUP BY doc_id),
shared AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
           FROM t a JOIN t b ON a.tg = b.tg AND a.doc_id < b.doc_id
           {cand_filter}
           GROUP BY 1, 2),
jac AS (SELECT d1, d2, round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
        FROM shared JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2)
"""
