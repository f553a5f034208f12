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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import _DOT_DUCK, _NORMS_DUCK, _norms, _sims_from_dots

# Rows of the q-side block materialized per numpy step inside a cell —
# bounds the in-flight (block x |cell|) dot matrix regardless of cell
# size; a no-op at fixture cells (~200 vectors).
_QBLOCK = 4096


def _cell_pair_dots(emb: DataFrame, cell_col: str) -> DataFrame:
    """All in-cell (qid, cid, dot) rows on the scaled-int64 dot lattice
    via ONE applyInPandas pass per cell.

    Replaces the join-then-mapInPandas shape (build (qid, cid, qe, ce)
    pair rows, ship BOTH 64-dim embeddings per pair through Arrow): here
    each embedding crosses the Python boundary once per CELL instead of
    once per PAIR — a ~2x|cell| cut in Arrow bytes (guide §4, the
    cosine_topk batch-3 rewrite applied to the symmetric case).

    Exactness: per dimension d the accumulator adds
    floor(q_d * c_d * 1e12) as int64 — the identical IEEE product,
    identical floor, and an exact integer sum over d, bit-identical to
    both the SQL formulation and _bcast_query_dots. Work and memory stay
    cell-bounded (the trade the module docstring documents); the q-side
    is blocked so the in-flight matrix never exceeds _QBLOCK x |cell|.
    """

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 "cid": pd.Series([], dtype="int64"),
                                 "dot": pd.Series([], dtype="float64")})
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        out = []
        for lo in range(0, m, _QBLOCK):
            qb = mat[lo:lo + _QBLOCK]
            acc = np.zeros((len(qb), m), dtype=np.int64)
            for d in range(mat.shape[1]):
                acc += np.floor(
                    np.multiply.outer(qb[:, d], mat[:, d]) * 1e12
                ).astype(np.int64)
            qid = np.repeat(ids[lo:lo + _QBLOCK], m)
            cid = np.tile(ids, len(qb))
            keep = qid != cid
            out.append(pd.DataFrame({
                "qid": qid[keep], "cid": cid[keep],
                "dot": acc.reshape(-1)[keep].astype(np.float64)}))
        return pd.concat(out, ignore_index=True)

    return (emb.select("vec_id", cell_col, "embedding")
            .groupBy(cell_col)
            .applyInPandas(per_cell, schema="qid long, cid long, dot double"))

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
    query's IVF label cell (module docstring). In-cell dots run in ONE
    per-cell applyInPandas pass on the exact int lattice (each embedding
    crosses Arrow once per cell, not once per pair); top-1 is a per-query
    window on rounded similarity; mutuality is one self-join of the O(N)
    top-1 table."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    sims = _sims_from_dots(_cell_pair_dots(emb, "label"), norms)
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
    # Norms from the base table: a vector's norm is independent of its
    # cell, and _sims_from_dots joins norms by qid/cid anyway — this
    # branch skips a second evaluation of the assignment join.
    norms = _norms(load_table(spark, sf_dir, "embeddings"))
    sims = _sims_from_dots(_cell_pair_dots(emb, "cell"), norms)
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
