"""ROUGE-2 scoring of near-duplicate candidate pairs — the overlap
metric an eval pipeline runs on dedup candidates (and on
summary-vs-source pairs): bigram MULTISET overlap, not the distinct-
shingle Jaccard the LSH verifier uses, so repeated phrases count with
multiplicity.

Candidates come from the SAME MinHash-LSH banding as minhash_lsh_pairs
(dedup.lsh_candidates — near-linear, never all-pairs); for each pair,
overlap = sum_g min(cnt_a(g), cnt_b(g)) over word bigrams, and
F1 = 2*overlap/(n_a + n_b). Counts are exact integers; F1 is one
division ROUNDED BEFORE ranking so the top-20 order is cross-engine
stable (the repo's rank-on-rounded discipline).

Scale stance (100 TB): bigram counting is one map-side explode +
groupBy; the overlap join is candidates x shared-bigrams (equi-join on
(doc, gram) then gram), bounded by LSH candidate volume; the output is
a top-20 TakeOrdered."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table_spread
from .dedup import _LSH_CAND_CTE_DUCK, lsh_candidates
from .shingles import _TG_CTE_DUCK, _doc_trigrams

_TOPK = 20

_BG_SPARK = ("case when size(ws) >= 2 then "
             "transform(sequence(0, size(ws) - 2), "
             "i -> concat(ws[i], ' ', ws[i + 1])) "
             "else array() end")

_ROUGE_ORACLE = f"""
WITH {_TG_CTE_DUCK},
{_LSH_CAND_CTE_DUCK},
bg AS (SELECT doc_id, g, cast(count(*) AS bigint) AS c
       FROM (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS g
             FROM w, unnest(range(greatest(len(ws) - 1, 0))) r(i))
       GROUP BY doc_id, g),
tot AS (SELECT doc_id, cast(greatest(len(ws) - 1, 0) AS bigint) AS n
        FROM w),
ov AS (SELECT c.d1, c.d2, cast(sum(least(a.c, b.c)) AS bigint) AS ov
       FROM cand c JOIN bg a ON a.doc_id = c.d1
            JOIN bg b ON b.doc_id = c.d2 AND b.g = a.g
       GROUP BY c.d1, c.d2),
scored AS (
  SELECT c.d1, c.d2, coalesce(ov.ov, 0) AS overlap,
         ta.n AS n_a, tb.n AS n_b,
         round(2.0 * coalesce(ov.ov, 0) / (ta.n + tb.n), 6) AS f1
  FROM cand c LEFT JOIN ov ON ov.d1 = c.d1 AND ov.d2 = c.d2
       JOIN tot ta ON ta.doc_id = c.d1
       JOIN tot tb ON tb.doc_id = c.d2
  WHERE ta.n + tb.n > 0)
SELECT d1, d2, overlap, n_a, n_b, f1
FROM scored ORDER BY f1 DESC, d1, d2 LIMIT {_TOPK}"""


@register(
    "rouge2_candidate_pairs",
    oracle=_ROUGE_ORACLE,
    tags=("dedup", "evaluation", "text", "lsh"),
)
def rouge2_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 LSH candidate pairs by ROUGE-2 F1 (bigram multiset overlap,
    module docstring): (d1, d2, overlap, n_a, n_b, f1), ranked on the
    ROUNDED f1 with (d1, d2) tiebreaks."""
    cand = lsh_candidates(_doc_trigrams(spark, sf_dir))
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    words = d.select("doc_id", F.split("text", " ").alias("ws"))
    bg = (words.select("doc_id", F.explode_outer(F.expr(_BG_SPARK))
                       .alias("g"))
          .filter(F.col("g").isNotNull())
          .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c")))
    tot = words.select(
        "doc_id",
        F.greatest(F.size("ws") - 1, F.lit(0)).cast("long").alias("n"))
    a = bg.select(F.col("doc_id").alias("d1"), "g", F.col("c").alias("ca"))
    b = bg.select(F.col("doc_id").alias("d2"), F.col("g"),
                  F.col("c").alias("cb"))
    ov = (cand.join(a, "d1").join(b, ["d2", "g"])
          .groupBy("d1", "d2")
          .agg(F.sum(F.least("ca", "cb")).alias("ov")))
    ta = tot.select(F.col("doc_id").alias("d1"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("doc_id").alias("d2"), F.col("n").alias("n_b"))
    scored = (cand.join(ov, ["d1", "d2"], "left")
              .join(ta, "d1").join(tb, "d2")
              .filter(F.col("n_a") + F.col("n_b") > 0)
              .select("d1", "d2",
                      F.coalesce("ov", F.lit(0)).cast("long")
                      .alias("overlap"),
                      "n_a", "n_b",
                      F.round(F.lit(2.0) * F.coalesce("ov", F.lit(0))
                              / (F.col("n_a") + F.col("n_b")), 6)
                      .alias("f1")))
    return (scored.orderBy(F.desc("f1"), "d1", "d2").limit(_TOPK)
            .select("d1", "d2", "overlap", "n_a", "n_b", "f1"))
