"""Shared shingling + exact-Jaccard building blocks used by the dedup
operator family (dedup.py) and cluster resolution (clusters.py).

Lives in its own module so importers get the helpers WITHOUT triggering
query registration — registration order is the driver's correctness-window
order, and helper imports must not perturb it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table, load_table_spread

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
    # spread: shingling is the CPU-heavy per-row step; the single-row-group
    # testdata would otherwise serialize it on one core (see
    # tables.load_table_spread).
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    # explode_outer + post-filter: a non-outer explode makes Catalyst infer
    # size(tgs)>0/isnotnull and push it to the scan, re-evaluating the full
    # trigram transform twice per row on the pre-spread single-split side
    # (measured ~3x the whole explode cost at sf0.1).
    return (d.select("doc_id", F.split("text", " ").alias("ws"))
            .select("doc_id",
                    F.explode_outer(F.expr(_TG_ARRAY_SPARK)).alias("tg"))
            .filter(F.col("tg").isNotNull())
            .distinct())


def _doc_trigram_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tgs: distinct-trigram array, n: set size) straight from the
    documents scan — one map-side pass, no explode, no shuffle. The verify
    path consumes this instead of the exploded shingle table: re-deriving a
    candidate doc's shingle SET from its text costs one row of work, while
    re-assembling it from the exploded table costs a corpus-wide shuffle."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    tgs = F.array_distinct(F.expr(_TG_ARRAY_SPARK))
    return (d.select("doc_id", F.split("text", " ").alias("ws"))
            .select("doc_id", tgs.alias("tgs"))
            .select("doc_id", "tgs", F.size("tgs").alias("n")))


def _jaccard_verified(tg: DataFrame, cand: DataFrame, threshold: float,
                      doc_sets: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard over candidate pairs (d1 < d2): |A∩B| / |A∪B|.

    Cost scales with |cand| x shingles-per-doc, NOT with the corpus: each
    candidate doc's shingle set arrives as ONE array row (``doc_sets``,
    ideally the map-side scan from _doc_trigram_sets) and the pair join
    computes size(array_intersect) per candidate — no join ever touches the
    exploded corpus shingle table, so the verify stage costs the same
    whether the corpus is 5k docs or 5B (only |candidates| matters). The
    previous shape (equi-join on (d2, tg)) shuffled every shingle in the
    corpus. Falls back to assembling doc_sets from ``tg`` (one filtered
    shuffle) when no scan-side source is available.
    """
    if doc_sets is None:
        docs = (cand.select(F.col("d1").alias("doc_id"))
                .union(cand.select(F.col("d2").alias("doc_id")))
                .distinct())
        doc_sets = (tg.join(F.broadcast(docs), "doc_id")
                    .groupBy("doc_id")
                    .agg(F.collect_list("tg").alias("tgs"),
                         F.count(F.lit(1)).alias("n")))
    a1 = doc_sets.select(F.col("doc_id").alias("d1"),
                         F.col("tgs").alias("tgs1"), F.col("n").alias("n1"))
    # scan(a1) ⋈ broadcast(cand) is map-side (cand is LSH output: a small
    # fraction of the corpus by construction). The d2 side is map-side
    # semi-filtered to candidate docs at its scan, so the final pair join
    # sees two candidate-sized inputs — left un-hinted on purpose: cand
    # carrying d1 arrays can be wide, and AQE picks broadcast at runtime
    # when it fits rather than trusting a driver-side hint at 100 TB.
    left = F.broadcast(cand).join(a1, "d1")
    d2docs = cand.select(F.col("d2").alias("doc_id")).distinct()
    a2 = (doc_sets.join(F.broadcast(d2docs), "doc_id")
          .select(F.col("doc_id").alias("d2"),
                  F.col("tgs").alias("tgs2"), F.col("n").alias("n2")))
    c = F.size(F.array_intersect("tgs1", "tgs2"))
    return (left.join(a2, "d2")
            .select("d1", "d2",
                    F.round(c / (F.col("n1") + F.col("n2") - c), 6)
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


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
