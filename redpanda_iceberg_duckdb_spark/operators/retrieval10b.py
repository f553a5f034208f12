"""NDCG@10 for the IVF index — the graded-relevance complement to
recall@k (hit anywhere in the list) and MRR@10 (where the single truth
sits): NDCG grades the WHOLE approximate ranking against exact-cosine
graded relevance (exact rank 1 -> rel 3, ranks 2-5 -> rel 2, ranks
6-10 -> rel 1, else 0).

Determinism trick (the MRR-2520 discipline applied to log discounts):
1/log2(i+1) is irrational, and libm log() is not guaranteed identically
rounded across engines — so the ten discount weights ride as FIXED
integer literals w_i = round(1e6/log2(i+1)), computed once in Python and
embedded in BOTH the Spark plan and the oracle SQL. DCG and IDCG are
then exact bigint sums (rel * w_i), and each query's NDCG is ONE
division of two bigints, rounded at 6.

Scale: probe queries are a fixed small set broadcast against the corpus
(the evaluation contract shared with ann_ivf_recall_at_k / ann_mrr_at_10);
the exact side is the documented brute-force ground-truth baseline, the
IVF side touches only the probe's label cell. Per-query output rows —
no cross-query floating aggregation at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import (_NORMS_DUCK, _SCALE, _bcast_query_dots, _norms,
                         _ranked_topk, _sims_from_dots, dot_int64)

# Fixed-point discount weights: w_i = round(1e6 / log2(i+1)), i = 1..10.
_W = {i: round(1e6 / math.log2(i + 1)) for i in range(1, 11)}
_REL_CASE_SQL = ("CASE WHEN rank = 1 THEN 3 WHEN rank <= 5 THEN 2 "
                 "WHEN rank <= 10 THEN 1 END")
_W_CASE_SQL = "CASE " + " ".join(
    f"WHEN {{col}} = {i} THEN {w}" for i, w in _W.items()) + " ELSE 0 END"


def _oracle() -> str:
    wi = _W_CASE_SQL.format(col="i.rank")
    wr = _W_CASE_SQL.format(col="g.irank")
    return f"""
WITH q AS (SELECT vec_id qid, label qlabel, embedding qe FROM embeddings
           WHERE vec_id % 100 = 0 AND vec_id < 6400),
{_NORMS_DUCK},
pairs_x AS (SELECT qid, vec_id cid, qe, embedding ce
            FROM q, embeddings WHERE vec_id <> qid),
dots_x AS (SELECT qid, cid,
                  cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                      * {_SCALE}) AS bigint)) AS double) AS dot
           FROM (SELECT qid, cid, unnest(qe) x, unnest(ce) y FROM pairs_x)
           GROUP BY qid, cid),
exact_ranked AS (
  SELECT d.qid, d.cid,
         row_number() OVER (PARTITION BY d.qid
           ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC, d.cid) rank
  FROM dots_x d JOIN norms nq ON nq.vec_id = d.qid
                JOIN norms nc ON nc.vec_id = d.cid),
grades AS (
  SELECT qid, cid, {_REL_CASE_SQL} AS rel
  FROM exact_ranked WHERE rank <= 10),
ideal AS (
  SELECT qid, sum(rel * {wr}) AS idcg_scaled FROM (
    SELECT qid, rel,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS irank
    FROM grades) g
  WHERE g.irank <= 10 GROUP BY qid),
pairs_i AS (SELECT qid, e.vec_id cid, qe, e.embedding ce
            FROM q JOIN embeddings e
              ON e.label = q.qlabel AND e.vec_id <> q.qid),
dots_i AS (SELECT qid, cid,
                  cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                      * {_SCALE}) AS bigint)) AS double) AS dot
           FROM (SELECT qid, cid, unnest(qe) x, unnest(ce) y FROM pairs_i)
           GROUP BY qid, cid),
ivf10 AS (SELECT qid, cid, rank FROM
            (SELECT d.qid, d.cid,
                    row_number() OVER (PARTITION BY d.qid
                      ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                               d.cid) rank
             FROM dots_i d JOIN norms nq ON nq.vec_id = d.qid
                           JOIN norms nc ON nc.vec_id = d.cid)
          WHERE rank <= 10),
dcg AS (
  SELECT i.qid, sum(coalesce(g.rel, 0) * {wi}) AS dcg_scaled
  FROM ivf10 i LEFT JOIN grades g ON g.qid = i.qid AND g.cid = i.cid
  GROUP BY i.qid)
SELECT q.qid AS qid,
       cast(coalesce(d.dcg_scaled, 0) AS bigint) AS dcg_scaled,
       cast(x.idcg_scaled AS bigint) AS idcg_scaled,
       round(cast(coalesce(d.dcg_scaled, 0) AS double) / x.idcg_scaled, 6)
         AS ndcg_at_10
FROM q JOIN ideal x ON x.qid = q.qid LEFT JOIN dcg d ON d.qid = q.qid
ORDER BY q.qid"""


def _w_case_spark(col: str) -> F.Column:
    expr = F.lit(0)
    c = F.col(col)
    out = None
    for i, w in _W.items():
        out = (F.when(c == i, w) if out is None
               else out.when(c == i, w))
    return out.otherwise(expr)


@register(
    "ndcg_at_10",
    oracle=_oracle(),
    tags=("similarity", "ann", "evaluation"),
)
def ndcg_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, dcg_scaled, idcg_scaled, ndcg_at_10): per-probe-query NDCG@10
    of the IVF nprobe=1 ranking against exact-cosine graded relevance;
    integer fixed-point discounts (module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = (emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 6400))
         .select(F.col("vec_id").alias("qid"),
                 F.col("label").alias("qlabel"),
                 F.col("embedding").alias("qe")))
    cand = emb.select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("ce"))
    exact10 = _ranked_topk(
        _sims_from_dots(_bcast_query_dots(q, cand), norms), 10)
    # grades feeds BOTH the ideal (idcg) and realised (dcg) branches; it
    # is <=|Q| x 10 rows by construction, so one eager checkpoint stops
    # the whole exact-dot corpus pass from re-running per branch
    # (r10 multi-branch lesson; the plan carried 2 MapInPandas before).
    grades = exact10.select(
        "qid", "cid",
        F.when(F.col("rank") == 1, 3)
        .when(F.col("rank") <= 5, 2).otherwise(1).alias("rel")
    ).localCheckpoint(eager=True)
    wi_ideal = W.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    ideal = (grades
             .withColumn("irank", F.row_number().over(wi_ideal))
             .filter(F.col("irank") <= 10)
             .groupBy("qid")
             .agg(F.sum(F.col("rel") * _w_case_spark("irank"))
                  .alias("idcg_scaled")))
    cand_cell = emb.select(F.col("vec_id").alias("cid"), "label",
                           F.col("embedding").alias("ce"))
    pairs_i = cand_cell.join(
        F.broadcast(q), (F.col("label") == F.col("qlabel"))
        & (F.col("cid") != F.col("qid")))
    dots_i = pairs_i.select(
        "qid", "cid", dot_int64("qe", "ce").cast("double").alias("dot"))
    ivf10 = _ranked_topk(_sims_from_dots(dots_i, norms), 10)
    dcg = (ivf10.join(grades.withColumnRenamed("rel", "grel"),
                      ["qid", "cid"], "left")
           .groupBy("qid")
           .agg(F.sum(F.coalesce(F.col("grel"), F.lit(0))
                      * _w_case_spark("rank")).alias("dcg_scaled")))
    return (q.select("qid").join(ideal, "qid").join(dcg, "qid", "left")
            .select("qid",
                    F.coalesce("dcg_scaled", F.lit(0)).cast("long")
                    .alias("dcg_scaled"),
                    F.col("idcg_scaled").cast("long").alias("idcg_scaled"),
                    F.round(F.coalesce("dcg_scaled", F.lit(0)).cast("double")
                            / F.col("idcg_scaled"), 6).alias("ndcg_at_10"))
            .orderBy("qid"))
