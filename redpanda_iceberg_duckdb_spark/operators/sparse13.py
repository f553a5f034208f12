"""Sparse TF-IDF cosine similarity between document pairs via the
inverted index — the term-at-a-time partial-dot-product join that scales
text similarity when vectors are sparse (the lexical complement of the
dense-embedding cosine family in similarity.py, and what BM25 retrieval
generalizes to pairwise form).

Vocabulary is df-capped (df <= _DF_CAP): high-df tokens contribute little
cosine mass per unit of join fan-out (idf ~ 0) and are exactly the terms
that quadratically blow up a postings self-join, so the operator is
DEFINED over the capped vocabulary — weights, norms, and dots all in the
same space, stated in both engines. This is the prefix-filter insight
(setsim.py's PPJoin) applied at the scoring level.

Lattice: idf is snapped once per token to micro-nats; weights w = tf *
idf_micro are exact integers, norms and dots exact integer sums, and the
cosine is one double division dot / sqrt(na2 * nb2) (fixed expression
tree; IEEE sqrt) rounded to 6 dp.

Scale stance (100 TB): postings build in one pass (tf per (doc, token)),
df in one map-side-combinable groupBy; the pair join fans out per token
by (docs containing it)^2 BOUNDED BY _DF_CAP^2 — never corpus^2; partial
dots combine map-side by (d1, d2); TakeOrderedAndProject emits the top
pairs. No window over data, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_DF_CAP = 100
_TOP = 50

_SPARSE_ORACLE = f"""
WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
tf AS (SELECT doc_id, tok, cast(count(*) AS bigint) AS tf
       FROM tk GROUP BY 1, 2),
nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
df AS (SELECT tok, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1
       HAVING count(*) <= {_DF_CAP}),
w AS (SELECT tf.doc_id, tf.tok,
             tf.tf * cast(round(ln(cast((SELECT n FROM nn) AS double)
                                   / df.df) * 1e6) AS bigint) AS w
      FROM tf JOIN df ON df.tok = tf.tok),
nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
dots AS (SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
         FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT d1, d2,
       round(cast(dot AS double)
             / sqrt(cast(na.n2 AS double) * cast(nb.n2 AS double)), 6)
         AS cosine
FROM dots JOIN nrm na ON na.doc_id = d1 JOIN nrm nb ON nb.doc_id = d2
ORDER BY cosine DESC, d1, d2 LIMIT {_TOP}"""


@register(
    "sparse_cosine_topk_pairs",
    oracle=_SPARSE_ORACLE,
    tags=("text", "similarity", "sparse", "llm-pipeline"),
)
def sparse_cosine_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP} document pairs by TF-IDF cosine over the df-capped
    vocabulary, via inverted-index partial dot products (module
    docstring)."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # Checkpointed: tf feeds the doc count, the df cap AND the weight
    # build, and w feeds the norms plus both sides of the inverted-index
    # self-join — without the two checkpoints each branch re-ran the
    # scan + tokenize + aggregate (12 documents scans in one plan, r15
    # scan audit). Tokenize once, weight once.
    tf = tk.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
        ).localCheckpoint(eager=True)
    nn = tf.agg(F.count_distinct("doc_id").alias("n"))
    df = (tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
          .filter(F.col("df") <= _DF_CAP))
    w = (tf.join(df, "tok").crossJoin(F.broadcast(nn))
         .select("doc_id", "tok",
                 (F.col("tf")
                  * F.round(F.log(F.col("n").cast("double") / F.col("df"))
                            * 1e6).cast("long")).alias("w"))
         ).localCheckpoint(eager=True)
    nrm = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    dots = (w.alias("a").join(w.alias("b"),
                              (F.col("a.tok") == F.col("b.tok"))
                              & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("d1"),
                     F.col("b.doc_id").alias("d2"))
            .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot")))
    na = nrm.select(F.col("doc_id").alias("d1"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("doc_id").alias("d2"), F.col("n2").alias("nb2"))
    return (dots.join(na, "d1").join(nb, "d2")
            .select("d1", "d2",
                    F.round(F.col("dot").cast("double")
                            / F.sqrt(F.col("na2").cast("double")
                                     * F.col("nb2").cast("double")), 6)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), "d1", "d2").limit(_TOP))
