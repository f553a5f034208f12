"""DSIR-style data selection with importance resampling (Xie et al.,
NeurIPS 2023): score every document in the raw pool by how much more
likely its hashed-n-gram features are under a TARGET-domain bag-of-words
model than under the raw-pool model, and keep the top-weighted documents
— the standard recipe for skewing a 100 TB pretraining pool toward a
quality/domain slice without training a classifier.

Target domain here = the English slice (lang = 'en'); features = unigram
tokens hashed into B = 256 buckets with the cross-engine md5 hash
(functions/hashing.py), add-1 smoothed. Per-document log importance
weight: logw(d) = sum_b c_b(d) * [ln p_t(b) - ln p_r(b)].

Scale stance: both feature distributions are ONE map-side-combinable
aggregate over the token stream (B-bounded results); the per-document
score joins each doc's bucket counts against the broadcast 256-row
log-ratio table — no shuffle wider than the (doc, bucket) aggregate. The
deterministic top-k here stands in for DSIR's Gumbel resampling (same
ordering statistic, reproducible); float note: the per-doc sum
accumulates ~100 terms, ulp-order drift only, inside round(…, 6) — the
lexicon.py avg_logprob precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_B = 256
_TARGET = "en"
_K = 50


def _oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents),
tk AS (SELECT doc_id, lang, {md5_mod_duck('w', _B)} AS b
       FROM toks WHERE w <> ''),
per_doc AS (SELECT doc_id, lang, b, count(*) c FROM tk GROUP BY 1, 2, 3),
ct AS (SELECT b, count(*) c FROM tk WHERE lang = '{_TARGET}' GROUP BY 1),
cr AS (SELECT b, count(*) c FROM tk GROUP BY 1),
nt AS (SELECT count(*) n FROM tk WHERE lang = '{_TARGET}'),
nr AS (SELECT count(*) n FROM tk),
lr AS (SELECT cr.b,
              ln((coalesce(ct.c, 0) + 1) / ((SELECT n FROM nt) + {_B}.0))
            - ln((cr.c + 1) / ((SELECT n FROM nr) + {_B}.0)) AS lw
       FROM cr LEFT JOIN ct ON ct.b = cr.b),
dw AS (SELECT doc_id, lang, sum(c * lw) AS logw
       FROM per_doc JOIN lr USING (b) GROUP BY 1, 2)
SELECT doc_id, lang, round(logw, 6) AS dsir_logweight
FROM dw ORDER BY round(logw, 6) DESC, doc_id LIMIT {_K}"""


@register(
    "dsir_importance_topk",
    oracle=_oracle(),
    tags=("curation", "domain", "sampling", "scale-pattern"),
)
def dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, dsir_logweight): the 50 most target-domain-like
    documents under the hashed-unigram importance weight (module
    docstring). A green row proves the hashed featurization, both
    smoothed models, and the log-ratio scoring agree bit-for-bit with an
    independent engine."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", "lang",
                        F.explode(F.split("text", " ")).alias("w"))
            .filter(F.col("w") != ""))
    tk = toks.select("doc_id", "lang",
                     F.expr(md5_mod_spark("w", _B)).alias("b"))
    # r15 optimization (guide §2.3 "aggregate before you shuffle" /
    # §1.2 "don't compute things you throw away"): ct/cr/nt/nr are all
    # exact integer marginals of per_doc (count(*) over tk == sum(c)
    # over per_doc), so deriving them from the ONE (doc, bucket)
    # aggregate replaces four extra full evaluations of the token
    # stream — each a documents scan + split/explode + per-token md5 —
    # with bucket-bounded re-aggregates of the checkpointed per_doc.
    # 5 token passes -> 1; bit-identical sums (integer counts).
    per_doc = (tk.groupBy("doc_id", "lang", "b")
               .agg(F.count(F.lit(1)).alias("c"))
               # eager: branches of ONE action would otherwise race-compute
               # the un-materialized checkpoint concurrently (r12 lesson)
               .localCheckpoint(eager=True))
    ct = (per_doc.filter(F.col("lang") == _TARGET)
          .groupBy("b").agg(F.sum("c").alias("tc")))
    cr = per_doc.groupBy("b").agg(F.sum("c").alias("rc"))
    nt = per_doc.filter(F.col("lang") == _TARGET).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("nt"))   # empty -> 0, as count(*)
    nr = per_doc.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("nr"))
    lr = (cr.join(ct, "b", "left")
          .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nr))
          .select("b",
                  (F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1)
                         .cast("double")
                         / (F.col("nt") + float(_B)))
                   - F.log((F.col("rc") + 1).cast("double")
                           / (F.col("nr") + float(_B)))).alias("lw")))
    dw = (per_doc.join(F.broadcast(lr), "b")
          .groupBy("doc_id", "lang")
          .agg(F.sum(F.col("c") * F.col("lw")).alias("logw")))
    return (dw.select("doc_id", "lang",
                      F.round("logw", 6).alias("dsir_logweight"))
            .orderBy(F.desc("dsir_logweight"), "doc_id")
            .limit(_K))
