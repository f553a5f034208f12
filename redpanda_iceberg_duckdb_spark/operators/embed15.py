"""Linear CKA (centered kernel alignment) between the two halves of the
embedding space — the standard representation-similarity readout
(Kornblith et al., ICML 2019): do dims 0..31 and dims 32..63 encode the
same geometry? The Matryoshka recall curve (embed14) asks this about
retrieval quality; CKA asks it about the representation itself.

Linear CKA = ||Xc'Yc||_F^2 / (||Xc'Xc||_F ||Yc'Yc||_F) over
column-centered halves. Everything reduces to the 64x64 second-moment
matrix S[i,j] = sum_rows q_i q_j and the dim sums m_i on the 1e4
integer lattice q = floor(x * 1e4):

    C[i,j] = n*S[i,j] - m_i*m_j        (exact DECIMAL(38,0))
    ||.||_F^2 per block = sum C^2      (exact DECIMAL(38,0))

with ONE double division + sqrt at the end. The quantization DEFINES
the metric (embed14 convention), so both engines agree bit-for-bit.
Overflow bound: |q| <= ~5.3e3 on this data; C^2 sums stay inside
DECIMAL(38,0) to n ~ 2e5 rows — far above every shipped SF; rescale the
lattice before lifting the bound.

Scale stance (100 TB): one explode + self-join per ROW on the row key
produces the (i, j) co-moment grid — 64^2 entries per row map-side,
reduced by a single (i, j)-keyed shuffle into a 4096-cell frame;
everything after is constant-size algebra. No pairwise row work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_DIM = 64
_HALF = 32
_Q = 10_000

_CKA_ORACLE = f"""
WITH q AS (
  SELECT vec_id, i.i AS i,
         cast(floor(cast(embedding[i.i] AS double) * {_Q}) AS bigint)
           AS qv
  FROM embeddings, lateral (
    SELECT unnest(generate_series(1, {_DIM})) AS i) i),
m AS (SELECT i, cast(sum(qv) AS bigint) AS mi,
             cast(count(*) AS bigint) AS n
      FROM q GROUP BY i),
s AS (SELECT a.i AS i, b.i AS j,
             cast(sum(cast(a.qv AS decimal(19, 0)) * b.qv)
                  AS decimal(38, 0)) AS sij
      FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i),
c AS (SELECT s.i, s.j,
             cast(ma.n AS decimal(38, 0)) * s.sij
               - cast(ma.mi AS decimal(38, 0)) * mb.mi AS cij
      FROM s JOIN m ma ON ma.i = s.i JOIN m mb ON mb.i = s.j),
blocks AS (
  SELECT sum(CASE WHEN i <= {_HALF} AND j > {_HALF}
                  THEN cij * cij ELSE 0 END) AS hxy,
         sum(CASE WHEN i <= {_HALF} AND j <= {_HALF}
                  THEN cij * cij ELSE 0 END) AS hxx,
         sum(CASE WHEN i > {_HALF} AND j > {_HALF}
                  THEN cij * cij ELSE 0 END) AS hyy
  FROM c)
SELECT (SELECT max(n) FROM m) AS n_rows,
       round(cast(hxy AS double)
             / sqrt(cast(hxx AS double) * cast(hyy AS double)), 6)
         AS cka
FROM blocks"""


@register(
    "linear_cka_dim_halves",
    oracle=_CKA_ORACLE,
    tags=("embedding", "representation", "lattice"),
)
def linear_cka_dim_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_rows, cka): linear CKA between the first and second 32 dims of
    the embedding matrix on the exact 1e4 lattice (module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.select(
            "vec_id",
            F.posexplode(F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * _Q).cast("long")))
            .alias("p", "qv"))
         .select("vec_id", (F.col("p") + 1).alias("i"), "qv"))
    m = q.groupBy("i").agg(F.sum("qv").cast("long").alias("mi"),
                           F.count(F.lit(1)).cast("long").alias("n"))
    s = (q.alias("a")
         .join(q.alias("b"), "vec_id")
         .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
         .agg(F.sum(F.col("a.qv").cast("decimal(19,0)") * F.col("b.qv"))
              .cast("decimal(38,0)").alias("sij")))
    c = (s.join(m.select(F.col("i"), F.col("mi").alias("ma"),
                         F.col("n")), "i")
         .join(m.select(F.col("i").alias("j"), F.col("mi").alias("mb")),
               "j")
         .select("i", "j",
                 (F.col("n").cast("decimal(38,0)") * F.col("sij")
                  - F.col("ma").cast("decimal(38,0)") * F.col("mb"))
                 .alias("cij")))
    half = F.lit(_HALF)
    blocks = c.agg(
        F.sum(F.when((F.col("i") <= half) & (F.col("j") > half),
                     F.col("cij") * F.col("cij")).otherwise(F.lit(0)))
        .alias("hxy"),
        F.sum(F.when((F.col("i") <= half) & (F.col("j") <= half),
                     F.col("cij") * F.col("cij")).otherwise(F.lit(0)))
        .alias("hxx"),
        F.sum(F.when((F.col("i") > half) & (F.col("j") > half),
                     F.col("cij") * F.col("cij")).otherwise(F.lit(0)))
        .alias("hyy"))
    n = m.agg(F.max("n").alias("n_rows"))
    return (blocks.crossJoin(F.broadcast(n))
            .select(F.col("n_rows"),
                    F.round(F.col("hxy").cast("double")
                            / F.sqrt(F.col("hxx").cast("double")
                                     * F.col("hyy").cast("double")), 6)
                    .alias("cka")))
