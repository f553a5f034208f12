"""Hard-negative mining for contrastive training: for each probe vector,
the most-similar vector with a DIFFERENT label (the hard negative — the
example a contrastive loss learns most from), the nearest same-label
neighbor (the positive), and the margin between them. Negative-mining
passes like this are how embedding-model training sets are built from an
unlabeled-pairs corpus; near-zero or negative margins flag probes whose
cell assignment is unreliable (read next to cluster_quality_silhouette).

Scale shape: identical to the evaluation family (similarity.py) — the
probe set is fixed-size and broadcast, candidate scoring is one pass of
Arrow-batched numpy dots over the corpus scan, and both the positive and
negative picks are per-probe top-1 windows over the scored pairs (one
shuffle partitioned by probe). Margins subtract already-rounded sims, so
cross-engine agreement is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import (_NORMS_DUCK, _SCALE, _bcast_query_dots, _norms,
                         _sims_from_dots)


@register(
    "hard_negative_mining",
    oracle=f"""
WITH q AS (SELECT vec_id qid, label qlabel, embedding qe FROM embeddings
           WHERE vec_id % 100 = 0 AND vec_id < 6400),
{_NORMS_DUCK},
pairs AS (SELECT qid, qlabel, vec_id cid, e.label clabel, qe, embedding ce
          FROM q, embeddings e WHERE e.vec_id <> qid),
dots AS (SELECT qid, cid,
                cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                    * {_SCALE}) AS bigint)) AS double) AS dot
         FROM (SELECT qid, cid, unnest(qe) x, unnest(ce) y FROM pairs)
         GROUP BY qid, cid),
sims AS (SELECT p.qid, p.qlabel, p.cid, p.clabel,
                round(d.dot / (nq.nrm * nc.nrm), 6) AS sim
         FROM (SELECT DISTINCT qid, qlabel, cid, clabel FROM pairs) p
         JOIN dots d ON d.qid = p.qid AND d.cid = p.cid
         JOIN norms nq ON nq.vec_id = p.qid
         JOIN norms nc ON nc.vec_id = p.cid),
neg AS (SELECT qid, cid AS hn_cid, sim AS hn_sim FROM
          (SELECT qid, cid, sim,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, cid) rn
           FROM sims WHERE clabel <> qlabel)
        WHERE rn = 1),
pos AS (SELECT qid, cid AS np_cid, sim AS np_sim FROM
          (SELECT qid, cid, sim,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, cid) rn
           FROM sims WHERE clabel = qlabel)
        WHERE rn = 1)
SELECT n.qid, n.hn_cid, n.hn_sim, p.np_cid, p.np_sim,
       round(p.np_sim - n.hn_sim, 6) AS margin
FROM neg n JOIN pos p ON p.qid = n.qid
ORDER BY n.qid""",
    tags=("similarity", "contrastive", "mining"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per probe: hardest cross-label negative, nearest same-label
    positive, and their margin (module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = (emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 6400))
         .select(F.col("vec_id").alias("qid"),
                 F.col("label").alias("qlabel"),
                 F.col("embedding").alias("qe")))
    cand = emb.select(F.col("vec_id").alias("cid"),
                      F.col("label").alias("clabel"),
                      F.col("embedding").alias("ce"))
    sims = (_sims_from_dots(_bcast_query_dots(q, cand), norms)
        .join(F.broadcast(q.select("qid", "qlabel")), "qid")
        .join(cand.select("cid", "clabel"), "cid"))
    # One window over (qid, is_pos) picks the hardest negative AND the
    # nearest positive in a single corpus pass — rn=1 inside each
    # is_pos partition is exactly the per-branch rn=1 the old two-branch
    # form computed, but the |Q| x N sims frame is now evaluated once
    # instead of once per branch (the plan carried 2 MapInPandas
    # before). The survivors frame is <=2|Q| rows by construction, so
    # the eager checkpoint before the self-join is a bounded
    # materialisation (r10 multi-branch lesson).
    w = W.partitionBy("qid", "is_pos").orderBy(F.desc("sim"), "cid")
    top = (sims.withColumn(
               "is_pos", F.col("clabel") == F.col("qlabel"))
           .withColumn("rn", F.row_number().over(w)).filter("rn = 1")
           .select("qid", "is_pos", "cid", "sim")
           .localCheckpoint(eager=True))
    neg = (top.filter(~F.col("is_pos"))
           .select("qid", F.col("cid").alias("hn_cid"),
                   F.col("sim").alias("hn_sim")))
    pos = (top.filter(F.col("is_pos"))
           .select("qid", F.col("cid").alias("np_cid"),
                   F.col("sim").alias("np_sim")))
    return (neg.join(pos, "qid")
            .select("qid", "hn_cid", "hn_sim", "np_cid", "np_sim",
                    F.round(F.col("np_sim") - F.col("hn_sim"), 6)
                    .alias("margin"))
            .orderBy("qid"))
