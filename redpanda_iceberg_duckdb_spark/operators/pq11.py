"""Product quantization (PQ) encode + distortion audit — the memory side
of billion-scale ANN (Jégou, Douze & Schmid, TPAMI 2011): split the
64-dim embedding into m = 8 subspaces of 8 dims, quantize each
sub-vector to its nearest sub-codebook centroid, and measure what the
8-byte code costs in squared error. The IVF family in similarity.py /
quantizer_train.py answers "which cells to probe"; PQ answers "how do a
billion vectors fit in RAM" — together they are the IVF-PQ layout every
production vector store runs at 100 TB.

Codebooks: the 10 label-cell centroids restricted to each subspace (the
same shipped-label cells the IVF queries use — no training loop here;
quantizer_train.py owns that story). All distance arithmetic rides the
exact floor(x*1e4) lattice of quantizer.py: per (vector, subspace, code)
the squared distance is sum_k (qv_k*n - s_k)^2 — an exact integer —
compared as (int/n^2) doubles with ties to the smallest code, so both
engines pick identical codes. Per-vector distortion is then carried as
floor(d_int * 1e6 / n^2) — an exact 128-bit integer (the stats10b
fixed-point discipline), so the subspace SUM is order-insensitive
integer addition and the reported average is one final division.

Scale stance (100 TB): the codebook is 10 codes x 8 subspaces x 8 dims
— KBs, broadcast; encoding is a map-side expansion (x codes) + one
combinable min-struct aggregate per (vector, subspace); the audit output
is subspace-cardinality. No shuffle touches anything vector-count-sized
except the one groupBy(vec, sub) whose key count is 8N with tiny rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_M = 8                  # subspaces
_DSUB = 64 // _M        # dims per subspace
_SCALE = 10 ** 6        # distortion fixed-point lattice


def _oracle() -> str:
    return f"""
WITH qd AS (
  SELECT vec_id, label,
         (generate_subscripts(embedding, 1) - 1) // {_DSUB} AS sub,
         generate_subscripts(embedding, 1) - 1 AS k,
         cast(floor(cast(unnest(embedding) AS double) * 1e4) AS bigint)
           AS qv
  FROM embeddings),
cb AS (
  SELECT label AS code, sub, k, sum(qv) AS s, count(*) AS n
  FROM qd GROUP BY 1, 2, 3),
dist AS (
  SELECT q.vec_id, q.sub, c.code,
         sum(cast(q.qv * c.n - c.s AS hugeint) * (q.qv * c.n - c.s))
           AS d_int,
         max(c.n) AS n
  FROM qd q JOIN cb c ON c.sub = q.sub AND c.k = q.k
  GROUP BY 1, 2, 3),
best AS (
  SELECT vec_id, sub, code, d_int, n FROM (
    SELECT vec_id, sub, code, d_int, n,
           row_number() OVER (
             PARTITION BY vec_id, sub
             ORDER BY cast(d_int AS double) / (cast(n AS double) * n),
                      code) AS rn
    FROM dist)
  WHERE rn = 1),
scaled AS (
  SELECT vec_id, sub, code,
         (d_int * {_SCALE}) // (cast(n AS hugeint) * n) AS ds
  FROM best)
SELECT sub AS subspace,
       cast(count(*) AS bigint) AS n_vecs,
       cast(count(DISTINCT code) AS bigint) AS n_codes_used,
       round(cast(sum(ds) AS double) / count(*) / {_SCALE} / 1e8, 6)
         AS avg_sq_err
FROM scaled GROUP BY 1 ORDER BY 1"""


@register(
    "pq_code_distortion",
    oracle=_oracle(),
    tags=("similarity", "ann", "quantization", "scale-pattern"),
)
def pq_code_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(subspace, n_vecs, n_codes_used, avg_sq_err): product-quantization
    audit — each sub-vector encoded to the nearest label-cell sub-centroid
    on the exact integer lattice; average squared reconstruction error
    per subspace from order-insensitive fixed-point sums (module
    docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dec = "decimal(38,0)"
    qd = (emb.select("vec_id", F.col("label").cast("int").alias("label"),
                     F.posexplode(F.expr(
                         "transform(embedding, x -> cast(floor("
                         "cast(x as double) * 1e4) as bigint))"))
                     .alias("k", "qv"))
          .withColumn("sub", F.expr(f"k div {_DSUB}")))
    cb = (qd.groupBy(F.col("label").alias("code"), "sub", "k")
          .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")))
    t = F.col("qv") * F.col("n") - F.col("s")
    dist = (qd.join(F.broadcast(cb), ["sub", "k"])
            .groupBy("vec_id", "sub", "code")
            .agg(F.sum(t.cast(dec) * t).alias("d_int"),
                 F.max("n").alias("n")))
    best = (dist
            .withColumn("d", F.col("d_int").cast("double")
                        / (F.col("n").cast("double") * F.col("n")))
            .groupBy("vec_id", "sub")
            .agg(F.min(F.struct("d", "code", "d_int", "n")).alias("b"))
            .select("vec_id", "sub", F.col("b.code").alias("code"),
                    F.col("b.d_int").alias("d_int"),
                    F.col("b.n").alias("n")))
    prod = F.col("d_int") * F.lit(_SCALE)
    nsq = (F.col("n").cast(dec) * F.col("n"))
    scaled = best.select(
        "vec_id", "sub", "code",
        ((prod - prod % nsq) / nsq).cast(dec).alias("ds"))
    return (scaled.groupBy(F.col("sub").alias("subspace"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.countDistinct("code").cast("long")
                 .alias("n_codes_used"),
                 F.round(F.sum("ds").cast("double") / F.count(F.lit(1))
                         / _SCALE / 1e8, 6).alias("avg_sq_err"))
            .orderBy("subspace"))
