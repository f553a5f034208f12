"""Training-mixture construction primitives: exact-balance stratified
K-fold assignment and token-budget-bounded per-source selection — the
two selection shapes a pretraining-data pipeline runs after curation
("split this corpus into K equal folds per language" and "take ~half of
each source's tokens, deterministically").

Both are hash-ordered (the cross-engine md5 hash, functions/hashing.py),
so the "random" order is reproducible, shuffle-stable, and identical in
the oracle; fold balance and budget cuts are then pure rank arithmetic.

Scale stance: each query is one window partitioned BY STRATUM/SOURCE
(strata parallelize; no global ordering anywhere) over one scan. At
100 TB a stratum bigger than one task's comfort uses the two-phase rank
(auc_eval.py pattern) inside its stratum; the fold/budget logic is
unchanged because it only consumes ranks and prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import md5_u64_duck, md5_u64_spark
from ..registry import register
from ..tables import load_table

_K = 5


def _kfold_oracle() -> str:
    return f"""
WITH ordered AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {md5_u64_duck("cast(doc_id AS varchar)")},
                                     doc_id) AS rn
  FROM documents),
folded AS (SELECT lang, doc_id, cast((rn - 1) % {_K} AS bigint) AS fold
           FROM ordered)
SELECT lang, fold, cast(count(*) AS bigint) AS n_docs,
       cast(sum(doc_id) AS bigint) AS id_checksum
FROM folded GROUP BY lang, fold ORDER BY lang, fold"""


@register(
    "stratified_kfold_assignment",
    oracle=_kfold_oracle(),
    tags=("curation", "split", "scale-pattern"),
)
def stratified_kfold_assignment(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """(lang, fold, n_docs, id_checksum): K=5 folds with EXACT per-stratum
    balance (fold sizes within each lang differ by at most 1 — guaranteed
    by round-robin over the hash-ordered rank, not just expected under a
    hash mod). Hash-stable: re-running on the same corpus reproduces the
    assignment; adding a stratum never perturbs other strata."""
    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(
            F.expr(md5_u64_spark("cast(doc_id AS string)")), "doc_id"))
    folded = docs.select(
        "lang", "doc_id",
        (F.pmod(rn - 1, _K)).cast("long").alias("fold"))
    return (folded.groupBy("lang", "fold")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("id_checksum"))
            .orderBy("lang", "fold"))


def _budget_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents),
tot AS (SELECT source, sum(n_tok) // 2 AS budget FROM toks GROUP BY source),
ordered AS (
  SELECT t.source, t.doc_id, t.n_tok, tot.budget,
         coalesce(sum(t.n_tok) OVER (
             PARTITION BY t.source
             ORDER BY {md5_u64_duck("cast(t.doc_id AS varchar)")}, t.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM toks t JOIN tot ON tot.source = t.source),
sel AS (SELECT source, doc_id, n_tok FROM ordered WHERE before < budget)
SELECT source, cast(count(*) AS bigint) AS n_selected,
       cast(sum(n_tok) AS bigint) AS tokens_selected,
       cast(sum(doc_id) AS bigint) AS id_checksum
FROM sel GROUP BY source ORDER BY source"""


@register(
    "token_budget_mixture",
    oracle=_budget_oracle(),
    tags=("curation", "sampling", "scale-pattern"),
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_selected, tokens_selected, id_checksum): per source,
    take documents in hash order until HALF the source's tokens are
    consumed (the doc crossing the boundary is included — the standard
    take-while-exclusive-prefix-below-budget rule, so the budget is always
    reached). "Give me a 50B-token mixture at these source weights" is
    this query with the budget column swapped for weight * target."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", "doc_id",
                       F.size(F.split("text", " ")).alias("n_tok"))
    tot = (toks.groupBy("source")
           .agg(F.expr("sum(n_tok) div 2").alias("budget")))
    w = (W.partitionBy("source")
         .orderBy(F.expr(md5_u64_spark("cast(doc_id AS string)")), "doc_id")
         .rowsBetween(W.unboundedPreceding, -1))
    ordered = (toks.join(F.broadcast(tot), "source")
               .withColumn("before",
                           F.coalesce(F.sum("n_tok").over(w), F.lit(0))))
    sel = ordered.filter(F.col("before") < F.col("budget"))
    return (sel.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_selected"),
                 F.sum("n_tok").cast("long").alias("tokens_selected"),
                 F.sum("doc_id").cast("long").alias("id_checksum"))
            .orderBy("source"))
