"""Mutual nearest neighbors over the embedding corpus — the bitext/
parallel-pair mining primitive (two items are a candidate pair only when
each is the other's top-1 neighbor; one-directional top-1 lists are full
of hubs, mutuality filters them — cf. the margin-based mining in
CCMatrix/LASER pipelines).

Candidate generation is IVF-cell-bounded (same coarse quantizer as
ann_ivf_topk: candidates share the query's label cell), so the pair work
is sum over cells of |cell|^2, never corpus^2 — the identical recall
trade the rest of the ANN family makes, and the only shape that survives
a billion-vector corpus. The exact corpus-wide variant is the degenerate
one-cell case.

Exactness rides the similarity module's scaled-int dot lattice: dots and
norms are exact int64 sums, cosine is the same IEEE double in both
engines, and ranking happens on the ROUNDED similarity with cid tiebreak
so float noise cannot reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import _DOT_DUCK, _NORMS_DUCK, _numpy_pair_dots, _norms, \
    _sims_from_dots

_MNN_ORACLE = f"""
WITH pairs AS (SELECT a.vec_id qid, b.vec_id cid, a.embedding qe, b.embedding ce
               FROM embeddings a JOIN embeddings b
                 ON a.label = b.label AND a.vec_id <> b.vec_id),
{_DOT_DUCK},
{_NORMS_DUCK},
sims AS (SELECT qid, cid,
                round(dot / (nq.nrm * nc.nrm), 6) AS sim
         FROM dots JOIN norms nq ON nq.vec_id = qid
                   JOIN norms nc ON nc.vec_id = cid),
t1 AS (SELECT qid, cid, sim FROM
         (SELECT qid, cid, sim,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, cid) rn
          FROM sims)
       WHERE rn = 1)
SELECT a.qid AS vec_a, a.cid AS vec_b, a.sim AS cosine
FROM t1 a JOIN t1 b ON a.cid = b.qid AND b.cid = a.qid
WHERE a.qid < a.cid
ORDER BY vec_a"""


@register(
    "mutual_nn_pairs",
    oracle=_MNN_ORACLE,
    tags=("similarity", "ann", "mining", "pandas_udf"),
)
def mutual_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal top-1 cosine neighbor pairs, candidates bounded to the
    query's IVF label cell (module docstring). Dots run numpy-batched in
    mapInPandas on the exact int lattice; top-1 is a per-query window on
    rounded similarity; mutuality is one self-join of the O(N) top-1
    table."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = emb.select(F.col("vec_id").alias("qid"), F.col("label").alias("ql"),
                   F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("label").alias("cl"),
                   F.col("embedding").alias("ce"))
    pairs = (q.join(c, (F.col("ql") == F.col("cl"))
                    & (F.col("qid") != F.col("cid")))
             .select("qid", "cid", "qe", "ce"))
    sims = _sims_from_dots(_numpy_pair_dots(pairs), norms)
    t1 = (sims.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")))
        .filter(F.col("rn") == 1).select("qid", "cid", "sim"))
    a = t1.select(F.col("qid").alias("vec_a"), F.col("cid").alias("vec_b"),
                  F.col("sim").alias("cosine"))
    b = t1.select(F.col("cid").alias("vec_a"), F.col("qid").alias("vec_b"))
    return (a.join(b, ["vec_a", "vec_b"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .orderBy("vec_a"))


def _mnn_retrained_oracle() -> str:
    from .quantizer_train import _ASSIGN_CTE
    return f"""
WITH RECURSIVE {_ASSIGN_CTE},
pairs AS (SELECT a.vec_id qid, b.vec_id cid, a.embedding qe, b.embedding ce
          FROM embeddings a JOIN fin fa ON fa.vec_id = a.vec_id
               JOIN fin fb ON fb.lbl = fa.lbl
               JOIN embeddings b ON b.vec_id = fb.vec_id
          WHERE a.vec_id <> b.vec_id),
{_DOT_DUCK},
{_NORMS_DUCK},
sims AS (SELECT qid, cid,
                round(dot / (nq.nrm * nc.nrm), 6) AS sim
         FROM dots JOIN norms nq ON nq.vec_id = qid
                   JOIN norms nc ON nc.vec_id = cid),
t1 AS (SELECT qid, cid, sim FROM
         (SELECT qid, cid, sim,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, cid) rn
          FROM sims)
       WHERE rn = 1)
SELECT a.qid AS vec_a, a.cid AS vec_b, a.sim AS cosine
FROM t1 a JOIN t1 b ON a.cid = b.qid AND b.cid = a.qid
WHERE a.qid < a.cid
ORDER BY vec_a"""


@register(
    "mutual_nn_retrained",
    oracle=_mnn_retrained_oracle(),
    tags=("similarity", "ann", "mining", "iterative", "pandas_udf"),
)
def mutual_nn_retrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors with candidates bounded to the RETRAINED
    k-means cells (quantizer_train.train_assignments — memoized converged
    Lloyd) instead of the shipped class labels. The shipped labels are
    class ids, not proximity cells (corpus-wide mutual-NN recall ~5% at
    sf0.001, measured in tests/test_round12_ops.py); retraining replaces
    them with actual cosine-coherent Voronoi cells, so this is the
    variant a production bitext miner runs. The oracle re-derives the
    SAME converged assignment with the self-terminating recursive CTE,
    then the identical in-cell mutual-NN construction."""
    from .quantizer_train import train_assignments

    fin, _ = train_assignments(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").join(
        fin.select("vec_id", F.col("lbl").alias("cell")), "vec_id")
    norms = _norms(emb)
    q = emb.select(F.col("vec_id").alias("qid"), F.col("cell").alias("ql"),
                   F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("cell").alias("cl"),
                   F.col("embedding").alias("ce"))
    pairs = (q.join(c, (F.col("ql") == F.col("cl"))
                    & (F.col("qid") != F.col("cid")))
             .select("qid", "cid", "qe", "ce"))
    sims = _sims_from_dots(_numpy_pair_dots(pairs), norms)
    t1 = (sims.withColumn(
        "rn", F.row_number().over(
            W.partitionBy("qid").orderBy(F.col("sim").desc(), "cid")))
        .filter(F.col("rn") == 1).select("qid", "cid", "sim"))
    a = t1.select(F.col("qid").alias("vec_a"), F.col("cid").alias("vec_b"),
                  F.col("sim").alias("cosine"))
    b = t1.select(F.col("cid").alias("vec_a"), F.col("qid").alias("vec_b"))
    return (a.join(b, ["vec_a", "vec_b"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .orderBy("vec_a"))
