"""Retrieval evaluation + diversification, round 9: MRR@10 for the IVF
index with EXACT integer reciprocal ranks, and greedy MMR (maximal
marginal relevance) diversified top-k.

MRR determinism trick: reciprocal ranks are fractions 1/1..1/10 whose
floating sums are order-dependent; scaling by lcm(1..10) = 2520 makes
every reciprocal an exact integer (2520 div rank), so the sum is an
order-independent bigint and only ONE final double division happens —
the same discipline as the scaled-integer dot products (similarity.py).

MMR (Carbonell & Goldstein, SIGIR 1998): greedily pick k documents
maximizing lambda*sim(q,d) - (1-lambda)*max_{s in S} sim(d,s). The greedy
argmax is inherently sequential in k; the scale discipline is the same as
BPE/k-means training loops: the candidate pool is first cut to a fixed
top-N by relevance (a distributed top-k over the corpus), the N x N
pairwise sims are one bounded join, and each of the k rounds is a
TakeOrdered(1) argmax with ONE scalar row to the driver. k and N are
constants, corpus size only enters the initial top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import (_DOT_DUCK, _NORMS_DUCK, _SCALE, _bcast_query_dots,
                         _norms, _ranked_topk, _sims_from_dots, dot_int64)

_RR_LCM = 2520          # lcm(1..10): 2520/rank is an exact integer
_MMR_QID = 0
_MMR_POOL = 20
_MMR_K = 5
_LAM = 0.7
_ONE_MINUS_LAM = 0.3   # exact literal on BOTH engines (1 - 0.7 in binary is not 0.3)


@register(
    "ann_mrr_at_10",
    oracle=f"""
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
exact1 AS (SELECT qid, cid AS tcid FROM
             (SELECT d.qid, d.cid,
                     row_number() OVER (PARTITION BY d.qid
                       ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                                d.cid) rank
              FROM dots_x d JOIN norms nq ON nq.vec_id = d.qid
                            JOIN norms nc ON nc.vec_id = d.cid)
           WHERE rank = 1),
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
rr AS (SELECT q.qid,
              coalesce({_RR_LCM} // i.rank, 0) AS rr_scaled
       FROM q JOIN exact1 x ON x.qid = q.qid
            LEFT JOIN ivf10 i ON i.qid = q.qid AND i.cid = x.tcid)
SELECT cast(count(*) AS bigint) AS n_queries,
       cast(sum(CASE WHEN rr_scaled > 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_hits_top10,
       round(cast(sum(rr_scaled) AS double) / {_RR_LCM} / count(*), 6)
         AS mrr_at_10
FROM rr""",
    tags=("similarity", "ann", "evaluation"),
)
def ann_mrr_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the IVF nprobe=1 index (shipped label cells) against the
    exact nearest neighbor: for each probe query, the reciprocal of the
    true NN's rank in the IVF top-10 (0 on a miss), averaged. Reciprocals
    ride as exact 2520/rank integers (module docstring) so the aggregate
    is order-independent. Same fixed probe-set / broadcast-query
    evaluation contract as ann_ivf_recall_at_k; MRR grades WHERE in the
    list the truth sits, recall only whether it appears."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = (emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 6400))
         .select(F.col("vec_id").alias("qid"),
                 F.col("label").alias("qlabel"),
                 F.col("embedding").alias("qe")))
    cand = emb.select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("ce"))
    exact1 = (_ranked_topk(
        _sims_from_dots(_bcast_query_dots(q, cand), norms), 1)
        .select("qid", F.col("cid").alias("tcid")))
    cand_cell = emb.select(F.col("vec_id").alias("cid"), "label",
                           F.col("embedding").alias("ce"))
    pairs_i = cand_cell.join(
        F.broadcast(q), (F.col("label") == F.col("qlabel"))
        & (F.col("cid") != F.col("qid")))
    dots_i = pairs_i.select(
        "qid", "cid", dot_int64("qe", "ce").cast("double").alias("dot"))
    ivf10 = (_ranked_topk(_sims_from_dots(dots_i, norms), 10)
             .select(F.col("qid").alias("iqid"), F.col("cid").alias("icid"),
                     "rank"))
    rr = (q.select("qid").join(exact1, "qid")
          .join(ivf10, (F.col("qid") == F.col("iqid"))
                & (F.col("tcid") == F.col("icid")), "left")
          .select("qid", F.coalesce(
              F.expr(f"cast({_RR_LCM} div rank as bigint)"), F.lit(0))
              .alias("rr_scaled")))
    return rr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("rr_scaled") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_hits_top10"),
        F.round(F.sum("rr_scaled").cast("double") / _RR_LCM
                / F.count(F.lit(1)), 6).alias("mrr_at_10"))


def _mmr_oracle() -> str:
    steps = ["""
s1 AS (SELECT cid, sim AS score, 1 AS pos FROM cand
       ORDER BY sim DESC, cid LIMIT 1),
sel1 AS (SELECT cid FROM s1)"""]
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
r{k} AS (SELECT c.cid, c.sim,
               round({_LAM} * c.sim - {_ONE_MINUS_LAM} * max(p.sim), 6)
                 AS score
        FROM cand c JOIN pw p ON p.c1 = c.cid
             AND p.c2 IN (SELECT cid FROM sel{k-1})
        WHERE c.cid NOT IN (SELECT cid FROM sel{k-1})
        GROUP BY c.cid, c.sim),
s{k} AS (SELECT cid, score, {k} AS pos FROM r{k}
        ORDER BY score DESC, cid LIMIT 1),
sel{k} AS (SELECT cid FROM sel{k-1} UNION ALL SELECT cid FROM s{k})""")
    finals = "\nUNION ALL\n".join(
        f"SELECT pos, cid, score FROM s{k}" for k in range(1, _MMR_K + 1))
    return f"""
WITH qv AS (SELECT embedding qe FROM embeddings WHERE vec_id = {_MMR_QID}),
pairs AS (SELECT {_MMR_QID} AS qid, vec_id cid, qe, embedding ce
          FROM embeddings, qv WHERE vec_id <> {_MMR_QID}),
{_DOT_DUCK},
{_NORMS_DUCK},
cand AS (SELECT cid, sim FROM
           (SELECT cid, round(dot / (nq.nrm * nc.nrm), 6) AS sim,
                   row_number() OVER (
                     ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, cid) rk
            FROM dots JOIN norms nq ON nq.vec_id = {_MMR_QID}
                      JOIN norms nc ON nc.vec_id = cid)
         WHERE rk <= {_MMR_POOL}),
ce AS (SELECT c.cid, e.embedding FROM cand c
       JOIN embeddings e ON e.vec_id = c.cid),
pwd AS (SELECT c1, c2,
               cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                   * {_SCALE}) AS bigint)) AS double) AS dot
        FROM (SELECT a.cid c1, b.cid c2, unnest(a.embedding) x,
                     unnest(b.embedding) y
              FROM ce a, ce b WHERE a.cid <> b.cid)
        GROUP BY c1, c2),
pw AS (SELECT c1, c2, round(dot / (n1.nrm * n2.nrm), 6) AS sim
       FROM pwd JOIN norms n1 ON n1.vec_id = c1
                JOIN norms n2 ON n2.vec_id = c2),
{','.join(steps)}
SELECT cast(pos AS bigint) AS pos, cid AS vec_id, score
FROM ({finals}) ORDER BY pos"""


@register(
    "mmr_diverse_topk",
    oracle=_mmr_oracle(),
    tags=("similarity", "retrieval", "diversification", "iterative"),
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR selection of {_MMR_K} diverse results for query vector
    {_MMR_QID} from its cosine top-{_MMR_POOL} pool (lambda = {_LAM}):
    step 1 takes the most relevant candidate; each later step takes
    argmax of lambda*sim(q,c) - (1-lambda)*max sim(c, selected). The
    oracle unrolls the identical greedy recurrence, so a green row proves
    every step's argmax and tie-break. Plan: distributed top-{_MMR_POOL}
    relevance cut, one bounded pairwise-sim join over the pool, then
    {_MMR_K} TakeOrdered(1) rounds with one scalar each (module
    docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = (emb.filter(F.col("vec_id") == _MMR_QID)
         .select(F.lit(_MMR_QID).cast("long").alias("qid"),
                 F.col("embedding").alias("qe")))
    cand_all = emb.select(F.col("vec_id").alias("cid"),
                          F.col("embedding").alias("ce"))
    pairs = cand_all.join(F.broadcast(q), F.col("cid") != F.col("qid"))
    dots = pairs.select("qid", "cid",
                        dot_int64("qe", "ce").cast("double").alias("dot"))
    cand = (_ranked_topk(_sims_from_dots(dots, norms), _MMR_POOL)
            .select("cid", "sim")
            .localCheckpoint(eager=False))   # reused by every greedy round
    ce = cand.join(emb.select(F.col("vec_id").alias("cid"), "embedding"),
                   "cid").select("cid", "embedding")
    a = ce.select(F.col("cid").alias("c1"), F.col("embedding").alias("e1"))
    b = ce.select(F.col("cid").alias("c2"), F.col("embedding").alias("e2"))
    pwd = (a.join(F.broadcast(b), F.col("c1") != F.col("c2"))
           .select("c1", "c2",
                   dot_int64("e1", "e2").cast("double").alias("dot")))
    pw = (pwd.join(F.broadcast(norms.select(F.col("vec_id").alias("c1"),
                                            F.col("nrm").alias("n1"))), "c1")
          .join(F.broadcast(norms.select(F.col("vec_id").alias("c2"),
                                         F.col("nrm").alias("n2"))), "c2")
          .select("c1", "c2",
                  F.round(F.col("dot") / (F.col("n1") * F.col("n2")), 6)
                  .alias("sim"))
          .localCheckpoint(eager=False))
    selected: list[tuple[int, int, float]] = []   # (pos, cid, score)
    for pos in range(1, _MMR_K + 1):
        chosen = [c for _, c, _ in selected]
        rem = cand.filter(~F.col("cid").isin(chosen)) if chosen else cand
        if not chosen:
            scored = rem.select("cid", F.col("sim").alias("score"))
        else:
            ms = (pw.filter(F.col("c2").isin(chosen))
                  .groupBy("c1").agg(F.max("sim").alias("ms")))
            scored = (rem.join(ms, rem.cid == ms.c1)
                      .select("cid",
                              F.round(_LAM * F.col("sim")
                                      - _ONE_MINUS_LAM * F.col("ms"), 6)
                              .alias("score")))
        row = scored.orderBy(F.desc("score"), "cid").limit(1).collect()[0]
        selected.append((pos, int(row["cid"]), float(row["score"])))
    return spark.createDataFrame(
        selected, "pos long, vec_id long, score double").orderBy("pos")
