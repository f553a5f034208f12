"""Random-hyperplane (SimHash) LSH for embedding cosine near-dups with
BANDED or-amplification — the production-shaped sibling of
similarity.py's embedding_near_dup_pairs (which buckets on the signs of
the first 16 coordinates and requires ALL 16 to match): here the 16
signature bits come from 16 pseudo-random +-1 hyperplanes (Charikar,
STOC 2002) split into 4 bands of 4 bits, and a pair becomes a candidate
if ANY band matches — the same banding trade the MinHash pipeline
(dedup.py) uses, tuned so near-dup pairs that flip a couple of signature
bits still surface.

Determinism: hyperplane signs are md5-derived in PYTHON at plan-build
time (sigma[h][d] = low bit of md5("hp:h:d")) and embedded as sixteen
64-char '+'/'-' literals in BOTH plans — the SPRT-constants discipline
(sprt10.py): no engine-side float or hash evaluation can diverge. The
projection sum rides the floor(x*1e4) integer lattice, so each signature
bit (proj >= 0) is an exact-integer comparison, bit-identical
cross-engine.

Scale stance (100 TB):
- Signature build: the (h, d, sgn) table is 1024 rows — broadcast — and
  the per-vector work is 16 exact integer dots (a map-side expansion +
  one combinable groupBy(vec_id, h)); signatures are 16 bits/vector.
- Banding: candidates form via 4 equi-joins on (band, value) — the
  banded-LSH shape used everywhere in this repo; the all-pairs quadratic
  never appears. Verification (exact cosine on the int64-scaled dot)
  touches only the candidate set.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import _NORMS_DUCK, _SCALE, _norms

_H = 16            # hyperplanes = signature bits
_BANDS = 4         # bands x 4 bits, any-band-match candidates
_ROWS_PER_BAND = _H // _BANDS
_TOPK = 20         # report the top-k banded candidates by exact cosine
# (a fixed absolute threshold returns an empty frame on this corpus —
# measured max pairwise cosine 0.51 at sf0.01 — so the checkable output
# is the ranked head of the candidate set instead: non-trivial at every
# SF and it exercises both the banding and the verification arithmetic)


def _sigma_strings() -> list[str]:
    """16 deterministic '+'/'-' sign strings of length 64 — md5-derived
    in Python once, embedded as literals in both engines' plans."""
    out = []
    for h in range(_H):
        out.append("".join(
            "+" if hashlib.md5(f"hp:{h}:{d}".encode()).digest()[0] & 1
            else "-" for d in range(64)))
    return out


_SIGMA = _sigma_strings()


def _oracle() -> str:
    sig_rows = ",\n         ".join(
        f"({h}, '{s}')" for h, s in enumerate(_SIGMA))
    return f"""
WITH sig(h, s) AS (VALUES {sig_rows}),
sigma AS (
  SELECT h, d,
         CASE WHEN substr(s, cast(d + 1 AS int), 1) = '+'
              THEN 1 ELSE -1 END AS sgn
  FROM sig, range(64) t(d)),
qd AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         cast(floor(cast(unnest(embedding) AS double) * 1e4) AS bigint)
           AS qv
  FROM embeddings),
proj AS (
  SELECT qd.vec_id, s.h, sum(qd.qv * s.sgn) AS p
  FROM qd JOIN sigma s ON s.d = qd.d
  GROUP BY 1, 2),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN p >= 0
                  THEN cast(1 AS bigint) << (h % {_ROWS_PER_BAND})
                  ELSE 0 END) AS val,
         h // {_ROWS_PER_BAND} AS band
  FROM proj GROUP BY vec_id, band),
cand AS (
  SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.val = y.val AND x.vec_id < y.vec_id),
pairs AS (
  SELECT c.v1, c.v2, e1.embedding AS q1, e2.embedding AS q2
  FROM cand c JOIN embeddings e1 ON e1.vec_id = c.v1
              JOIN embeddings e2 ON e2.vec_id = c.v2),
dots AS (
  SELECT v1, v2,
         cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                             * {_SCALE}) AS bigint)) AS double) AS dot
  FROM (SELECT v1, v2, unnest(q1) x, unnest(q2) y FROM pairs)
  GROUP BY 1, 2),
{_NORMS_DUCK}
SELECT rank, v1, v2, sim FROM (
  SELECT v1, v2, round(dot / (n1.nrm * n2.nrm), 6) AS sim,
         row_number() OVER (
           ORDER BY round(dot / (n1.nrm * n2.nrm), 6) DESC, v1, v2)
           AS rank
  FROM dots JOIN norms n1 ON n1.vec_id = v1
            JOIN norms n2 ON n2.vec_id = v2)
WHERE rank <= {_TOPK}
ORDER BY rank"""


@register(
    "hyperplane_lsh_near_dups",
    oracle=_oracle(),
    tags=("similarity", "dedup", "lsh", "scale-pattern"),
)
def hyperplane_lsh_near_dups(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """(rank, v1, v2, sim): the top-20 most-similar pairs surfaced by
    banded random-hyperplane LSH (4 bands x 4 md5-seeded sign bits, any
    band matching), verified at exact int64-lattice cosine — the
    or-amplified production scheme next to the exact-16-bit coordinate
    bucketing of embedding_near_dup_pairs (module docstring)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    # r15 optimization (guide §4.2 "hand whole batches to vectorized
    # native code"): the old projection path posexploded every embedding
    # to 64 (vec, dim) rows, broadcast-joined the 16 x 64 sign matrix
    # (x16 row blowup -> 2M rows at sf0.1) and ran TWO aggregates to
    # rebuild per-vector band keys. One mapInPandas pass now computes
    # all 16 signed projections per vector as an exact int64 matmul
    # (floor(x * 1e4) int64 dotted with a +-1 int64 matrix — every
    # intermediate is an integer, bit-identical to the SQL formulation)
    # and emits the 4 (vec_id, band, val) bucket rows directly: the
    # explode, the join, and both aggregate exchanges disappear.
    sgn_rows = [[1 if _SIGMA[h][d] == "+" else -1 for h in range(_H)]
                for d in range(64)]

    def project(batches):
        sgn = np.array(sgn_rows, dtype=np.int64)          # 64 x H
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv = np.floor(np.array(list(pdf["embedding"]),
                                   dtype=np.float64) * 1e4).astype(np.int64)
            p = qv @ sgn                                   # N x H, exact
            bits = (p >= 0).astype(np.int64)
            vids = pdf["vec_id"].to_numpy()
            out = []
            for band in range(_H // _ROWS_PER_BAND):
                val = sum(bits[:, band * _ROWS_PER_BAND + j] << j
                          for j in range(_ROWS_PER_BAND))
                out.append(pd.DataFrame({
                    "vec_id": vids,
                    "band": np.full(len(vids), band, dtype=np.int64),
                    "val": val}))
            yield pd.concat(out)

    buckets = emb.select("vec_id", "embedding").mapInPandas(
        project, schema="vec_id long, band long, val long")
    x = buckets.select(F.col("vec_id").alias("v1"), "band", "val")
    y = buckets.select(F.col("vec_id").alias("v2"), "band", "val")
    cand = (x.join(y, ["band", "val"])
            .filter(F.col("v1") < F.col("v2"))
            .select("v1", "v2").distinct())
    e1 = emb.select(F.col("vec_id").alias("v1"),
                    F.col("embedding").alias("q1"))
    e2 = emb.select(F.col("vec_id").alias("v2"),
                    F.col("embedding").alias("q2"))
    pairs = cand.join(e1, "v1").join(e2, "v2")
    # Candidate-pair dots through the Arrow/numpy path (the similarity.py
    # int64-lattice shape) instead of the interpreted JVM
    # aggregate/zip_with fold — the r11-documented CodegenFallback cost,
    # now off the hot path. Same exact int64-lattice math.
    def pair_dots(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m1 = np.array(list(pdf["q1"]), dtype=np.float64)
            m2 = np.array(list(pdf["q2"]), dtype=np.float64)
            d = np.floor(m1 * m2 * 1e12).astype(np.int64).sum(axis=1)
            yield pd.DataFrame({"v1": pdf["v1"].to_numpy(),
                                "v2": pdf["v2"].to_numpy(),
                                "dot": d.astype(np.float64)})

    dots = pairs.select("v1", "v2", "q1", "q2").mapInPandas(
        pair_dots, schema="v1 long, v2 long, dot double")
    n1 = norms.select(F.col("vec_id").alias("v1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("vec_id").alias("v2"), F.col("nrm").alias("nrm2"))
    sims = (dots.join(n1, "v1").join(n2, "v2")
            .select("v1", "v2",
                    F.round(F.col("dot")
                            / (F.col("nrm1") * F.col("nrm2")), 6)
                    .alias("sim")))
    w = W.orderBy(F.desc("sim"), "v1", "v2")
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _TOPK)
            .select("rank", "v1", "v2", "sim")
            .orderBy("rank"))
