"""SemDeDup-style semantic deduplication over the ``embeddings`` table
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" — public arXiv:2303.09540).

The technique: cluster embeddings coarsely (here the pre-assigned ``label``
column, trained offline by the same k-means the IVF ANN queries use — see
label_centroids), then deduplicate ONLY within clusters: a vector is dropped
when an earlier-id vector in its cluster is more cosine-similar than the
threshold. Clustering bounds the quadratic: all-pairs cosine over N vectors
is O(N^2), but within k balanced cells it is O(N^2 / k), embarrassingly
parallel across cells — the whole reason the paper scales to web corpora.

Cross-engine determinism: the int64-scaled dot convention from similarity.py
(floor(x*y*1e12) summed — exact, order-independent), so the numpy path here,
Spark SQL, and the DuckDB oracle agree bit-for-bit on every cosine.

Scale stance: applyInPandas per cluster cell — each cell's gram computation
is a local numpy loop (Arrow batch in, C-speed per row), state O(cell^2)
bounded by the clustering. At 100 TB the cells are the unit of parallelism
(one task per cell, salting oversized cells into sub-cells first); nothing
global, no driver participation. In production the floor-scaling would drop
away in favor of plain BLAS matmul — it exists here so an independent engine
can verify the results exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_SCALE = 1e12
_THRESHOLD = 0.30  # driver testdata embeddings are near-orthogonal; 0.30
                   # sits at ~p99 of within-cell cosine, so drops are real
                   # but survivors dominate (the regime SemDeDup targets).

_ORACLE = f"""
WITH norms AS (
  SELECT vec_id,
         sqrt(cast(sum(cast(floor(cast(x AS double) * cast(x AS double)
                                  * {_SCALE:.0f}) AS bigint)) AS double)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) x FROM embeddings)
  GROUP BY vec_id),
pairs AS (
  SELECT a.label, a.vec_id qid, b.vec_id cid, a.embedding qe, b.embedding ce
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id),
dots AS (
  SELECT label, qid, cid,
         cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                             * {_SCALE:.0f}) AS bigint)) AS double) AS dot
  FROM (SELECT label, qid, cid, unnest(qe) x, unnest(ce) y FROM pairs)
  GROUP BY label, qid, cid),
dropped AS (
  SELECT DISTINCT d.label, d.cid
  FROM dots d
  JOIN norms n1 ON n1.vec_id = d.qid
  JOIN norms n2 ON n2.vec_id = d.cid
  WHERE d.dot / (n1.nrm * n2.nrm) >= {_THRESHOLD}),
base AS (
  SELECT e.label, e.vec_id, dr.cid AS dropped_id
  FROM embeddings e
  LEFT JOIN dropped dr ON dr.label = e.label AND dr.cid = e.vec_id)
SELECT label,
       count(*) AS n_vecs,
       cast(count(*) - count(dropped_id) AS bigint) AS n_survivors,
       cast(count(dropped_id) AS bigint) AS n_dropped,
       min(dropped_id) AS first_dropped_vec_id
FROM base GROUP BY label ORDER BY label"""

_OUT_SCHEMA = ("label int, n_vecs bigint, n_survivors bigint, "
               "n_dropped bigint, first_dropped_vec_id bigint")


def _dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    n = len(pdf)
    nrm = np.sqrt(
        np.floor(X * X * _SCALE).astype(np.int64).sum(axis=1)
        .astype(np.float64))
    dropped = np.zeros(n, dtype=bool)
    for i in range(1, n):
        # exact int-scaled dots of vec i against every earlier vec
        dots = (np.floor(X[:i] * X[i] * _SCALE).astype(np.int64)
                .sum(axis=1).astype(np.float64))
        cos = dots / (nrm[:i] * nrm[i])
        # greedy against all earlier ids (matches the SQL oracle's
        # EXISTS-earlier rule; survivor-only comparison would need the
        # sequential dependency the oracle can't express)
        if (cos >= _THRESHOLD).any():
            dropped[i] = True
    first_dropped = (int(pdf.loc[dropped, "vec_id"].min())
                     if dropped.any() else None)
    return pd.DataFrame({
        "label": [int(pdf["label"].iloc[0])],
        "n_vecs": [n],
        "n_survivors": [int(n - dropped.sum())],
        "n_dropped": [int(dropped.sum())],
        "first_dropped_vec_id": [first_dropped],
    })


@register(
    "semdedup_survivors",
    oracle=_ORACLE,
    tags=("dedup", "embeddings", "semdedup"),
)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster SemDeDup summary: vectors in the cell, survivors after
    greedy earlier-id cosine dedup at 0.30, and the first dropped id (a
    cheap cross-engine canary for WHICH vectors dropped, not just how
    many). Module docstring has the scale analysis; the oracle replicates
    the exact int-scaled cosine rule as pure SQL."""
    e = load_table(spark, sf_dir, "embeddings")
    return (e.select("label", "vec_id", "embedding")
            .groupBy("label")
            .applyInPandas(_dedup_cell, _OUT_SCHEMA)
            .orderBy("label"))
