"""Quantizer training + dimensionality reduction for the embedding column:
one exact k-means Lloyd iteration (the offline step that trains the IVF
coarse cells used by ann_ivf_topk/ann_ivf_multiprobe) and a
Johnson-Lindenstrauss random-sign projection with a measured distortion
audit.

Determinism:
- The Lloyd step uses the scaled-integer centroid-distance formulation from
  ann_ivf_multiprobe (similarity.py): dist(q, cell) compares
  Σ_k (floor(q_k·1e4)·n − S_k)² / n² with S_k the cell's scaled coordinate
  sum — exact integers under the double division, ties broken by label, so
  the new assignment is bit-identical cross-engine.
- The JL projection matrix is a FIXED ±1 sign matrix derived from the md5
  convention in functions/hashing.py: sign(k, j) = +1 iff
  md5_u64(f"{k}:{j}") is even. The signs are materialized as literal
  arrays at query-build time (they are constants — no engine needs to
  hash anything at run time), so the projection is a pure map-side
  zip_with fold: zero shuffles, zero UDFs.

Scale stance (100 TB):
- Lloyd: the centroid table is cells × dims — KBs — and broadcasts; the
  assignment pass is one map-side cross of each vector against the
  broadcast centroids plus one aggregate for the transition summary. This
  is exactly how Spark MLlib's k-means iterates (broadcast centers +
  mapPartitions), expressed relationally so the oracle can check it.
- JL: projecting 64-dim → 16-dim cuts every downstream ANN/dedup pass's
  bandwidth 4×; the audit query MEASURES the cosine distortion on real
  pairs instead of quoting the JL bound. Everything is map-side except
  the final pair join of adjacent vec_ids.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import dot_int64

_DIMS = 64
_JL_DIMS = 16


def _md5_u64(s: str) -> int:
    """Python replica of DuckDB md5_number_lower / functions.hashing
    md5_u64_spark: little-endian uint64 of the LAST 8 md5 digest bytes."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


# sign(k, j) for source dim k (0-based) and target dim j — fixed constants
# shared verbatim by the Spark expression and the DuckDB oracle.
_SIGNS = [[1 if _md5_u64(f"{k}:{j}") % 2 == 0 else -1
           for k in range(_DIMS)] for j in range(_JL_DIMS)]


_LLOYD_ORACLE = """
WITH cs AS (
  SELECT label, k,
         sum(cast(floor(cast(x as double) * 1e4) as bigint)) AS s,
         count(*) AS n
  FROM (SELECT label, unnest(embedding) x,
               generate_subscripts(embedding, 1) k FROM embeddings)
  GROUP BY label, k),
qd AS (SELECT vec_id AS qid, label AS old_label, k,
              cast(floor(cast(x as double) * 1e4) as bigint) AS qv
       FROM (SELECT vec_id, label, unnest(embedding) x,
                    generate_subscripts(embedding, 1) k FROM embeddings)),
dist AS (SELECT qid, old_label, cs.label,
                cast(sum(cast(qv * n - s as hugeint) * (qv * n - s))
                     as double) / (cast(n as double) * n) AS dist
         FROM qd JOIN cs USING (k) GROUP BY qid, old_label, cs.label, n),
assign AS (SELECT qid, old_label, label AS new_label FROM
             (SELECT qid, old_label, label,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY dist, label) rn
              FROM dist) WHERE rn = 1)
SELECT new_label,
       cast(count(*) AS bigint) AS n_next,
       cast(sum(CASE WHEN new_label = old_label THEN 1 ELSE 0 END)
            AS bigint) AS n_stay,
       cast(sum(CASE WHEN new_label <> old_label THEN 1 ELSE 0 END)
            AS bigint) AS n_moved_in
FROM assign GROUP BY new_label ORDER BY new_label"""


@register(
    "kmeans_lloyd_step",
    oracle=_LLOYD_ORACLE,
    tags=("similarity", "clustering", "iterative"),
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration over the embeddings' current cells (the
    ``label`` column): recompute every cell centroid, reassign every
    vector to its nearest centroid, and report the per-cell transition
    summary (size after, stayers, movers-in). This is the offline
    quantizer-training step behind the IVF ANN queries — here the
    convergence signal (Σ n_moved_in → 0) is what production would loop
    on. Module docstring has the exact-integer distance trick and the
    broadcast layout."""
    emb = load_table(spark, sf_dir, "embeddings")
    cs = (emb.select("label", F.posexplode("embedding").alias("k", "x"))
          .groupBy("label", "k")
          .agg(F.sum(F.floor(F.col("x").cast("double") * 1e4).cast("long"))
               .alias("s"),
               F.count(F.lit(1)).alias("n")))
    cent = (cs.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("k", "s"))).alias("ks"),
                 F.max("n").alias("n"))
            .select("label",
                    F.expr("transform(ks, t -> t.s)").alias("s_arr"), "n"))
    q = emb.select(F.col("vec_id").alias("qid"),
                   F.col("label").alias("old_label"),
                   F.col("embedding").alias("qe"))
    term = ("cast(cast(floor(cast(x as double) * 1e4) as bigint) * n - s "
            "as decimal(19,0))")
    dist = (q.crossJoin(F.broadcast(cent))
            .select("qid", "old_label", "label", F.expr(
                f"cast(aggregate(zip_with(qe, s_arr, (x, s) -> "
                f"{term} * {term}), cast(0 as decimal(38,0)), "
                "(acc, v) -> acc + v) as double) "
                "/ (cast(n as double) * n)").alias("dist")))
    assign = (dist.withColumn("rn", F.row_number().over(
                  W.partitionBy("qid").orderBy("dist", "label")))
              .filter(F.col("rn") == 1)
              .select("qid", "old_label", F.col("label").alias("new_label")))
    return (assign.groupBy("new_label")
            .agg(F.count(F.lit(1)).alias("n_next"),
                 F.sum(F.when(F.col("new_label") == F.col("old_label"), 1)
                       .otherwise(0)).cast("bigint").alias("n_stay"),
                 F.sum(F.when(F.col("new_label") != F.col("old_label"), 1)
                       .otherwise(0)).cast("bigint").alias("n_moved_in"))
            .orderBy("new_label"))


def _proj_expr_spark(col: str, j: int) -> str:
    arr = "array(" + ", ".join(str(s) for s in _SIGNS[j]) + ")"
    return (f"aggregate(zip_with({col}, {arr}, (x, s) -> "
            "cast(floor(cast(x as double) * 1e4) as bigint) * s), "
            "cast(0 as bigint), (acc, v) -> acc + v)")


def _proj_expr_duck(col: str, j: int) -> str:
    arr = "[" + ", ".join(str(s) for s in _SIGNS[j]) + "]"
    return (f"list_sum(list_transform(range(1, {_DIMS + 1}), i -> "
            f"cast(floor(cast({col}[i] as double) * 1e4) as bigint) "
            f"* ({arr})[i]))")


def _jl_oracle() -> str:
    proj = ", ".join(
        f"{_proj_expr_duck('embedding', j)} AS p{j}"
        for j in range(_JL_DIMS))
    pn = " + ".join(f"cast(p{j} AS double) * p{j}" for j in range(_JL_DIMS))
    pdot = " + ".join(f"cast(a.p{j} AS double) * b.p{j}"
                      for j in range(_JL_DIMS))
    return f"""
WITH pr AS (SELECT vec_id, embedding, {proj} FROM embeddings),
n64 AS (SELECT vec_id,
               sqrt(cast(sum(cast(floor(cast(x AS double) * cast(x AS double)
                                        * 1e12) AS bigint)) AS double)) AS nrm
        FROM (SELECT vec_id, unnest(embedding) x FROM embeddings)
        GROUP BY vec_id),
pairs AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                 a.embedding AS qe, b.embedding AS ce,
                 ({pdot}) / (sqrt({
                     ' + '.join(f'cast(a.p{j} AS double) * a.p{j}'
                                for j in range(_JL_DIMS))})
                   * sqrt({
                     ' + '.join(f'cast(b.p{j} AS double) * b.p{j}'
                                for j in range(_JL_DIMS))})) AS cos16
          FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1
          WHERE a.vec_id % 20 = 0),
d64 AS (SELECT qid, cid, cos16,
               cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                   * 1e12) AS bigint)) AS double) AS dot
        FROM (SELECT qid, cid, cos16, unnest(qe) x, unnest(ce) y FROM pairs)
        GROUP BY qid, cid, cos16)
SELECT qid, cid,
       round(dot / (na.nrm * nb.nrm), 6) AS cos64,
       round(cos16, 6) AS cos16,
       round(abs(dot / (na.nrm * nb.nrm) - cos16), 6) AS abs_err
FROM d64 JOIN n64 na ON na.vec_id = qid JOIN n64 nb ON nb.vec_id = cid
ORDER BY qid"""


@register(
    "jl_projection_distortion",
    oracle=_jl_oracle(),
    tags=("similarity", "dimensionality-reduction"),
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit: project 64-dim embeddings to 16 dims
    with the fixed ±1 sign matrix, then MEASURE per-pair cosine distortion
    (|cos64 − cos16|) on adjacent-id pairs — the evidence that gates
    running downstream dedup/ANN on the 4×-cheaper sketch. The projection
    itself is a literal-array zip_with fold (constants baked at plan time,
    no hashing at run time, no shuffle); only the pair join exchanges."""
    emb = load_table(spark, sf_dir, "embeddings")
    pr = emb.select(
        "vec_id", "embedding",
        *[F.expr(_proj_expr_spark("embedding", j)).alias(f"p{j}")
          for j in range(_JL_DIMS)])
    pnorm = lambda pfx: F.sqrt(sum(  # noqa: E731
        F.col(f"{pfx}p{j}").cast("double") * F.col(f"{pfx}p{j}")
        for j in range(_JL_DIMS)))
    a = pr.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        *[F.col(f"p{j}").alias(f"ap{j}") for j in range(_JL_DIMS)])
    b = pr.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
        *[F.col(f"p{j}").alias(f"bp{j}") for j in range(_JL_DIMS)])
    pdot = sum(F.col(f"ap{j}").cast("double") * F.col(f"bp{j}")
               for j in range(_JL_DIMS))
    pairs = (a.join(b, F.col("cid") == F.col("qid") + 1)
             .withColumn("cos16", pdot / (pnorm("a") * pnorm("b"))))
    n64 = emb.select(
        "vec_id",
        F.sqrt(dot_int64("embedding", "embedding").cast("double"))
         .alias("nrm"))
    d64 = pairs.select(
        "qid", "cid", "cos16",
        dot_int64("qe", "ce").cast("double").alias("dot"))
    return (d64
            .join(F.broadcast(n64.select(F.col("vec_id").alias("qid"),
                                         F.col("nrm").alias("na"))), "qid")
            .join(F.broadcast(n64.select(F.col("vec_id").alias("cid"),
                                         F.col("nrm").alias("nb"))), "cid")
            .select("qid", "cid",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                     .alias("cos64"),
                    F.round("cos16", 6).alias("cos16"),
                    F.round(F.abs(F.col("dot") / (F.col("na") * F.col("nb"))
                                  - F.col("cos16")), 6).alias("abs_err"))
            .orderBy("qid"))
