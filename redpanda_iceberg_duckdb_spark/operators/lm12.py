"""Bigram language-model perplexity as a document quality filter — the
CCNet/KenLM-style signal (documents whose cross-entropy under a corpus LM
is extreme are boilerplate or noise; mid-band survives). Complements
unigram_logprob_quality (lexicon.py) with CONTEXT: a doc full of common
tokens in impossible orders scores fine under a unigram model and badly
here.

Model: add-one-smoothed bigram LM trained on the whole corpus,
p(v|u) = (c(u,v) + 1) / (c(u) + V), V = corpus unigram vocabulary.
Per doc, cross-entropy H = -(1/m) * sum over its m bigrams of ln p(v|u).

Micro-nat discipline (text11/nblm10): each ln p is snapped ONCE to
micro-nats; per-doc sums then ride exact bigints and the one final
division is identical in both engines — no float-sum-order hazard, and
the 1e-6 snap absorbs last-ulp libm differences.

Scale stance: bigrams come from an array slice-zip below the explode
(one pass, no self-join, no window); the LM is a bigram-vocabulary-sized
table (corpus-bounded only through distinct bigrams); scoring is one
equi-join of the doc bigram stream against it and one groupBy doc. The
corpus is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_LM_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
tk AS (SELECT doc_id, unnest(a) AS tok, generate_subscripts(a, 1) AS i
       FROM toks),
bg AS (SELECT x.doc_id, x.tok AS u, y.tok AS v
       FROM tk x JOIN tk y ON y.doc_id = x.doc_id AND y.i = x.i + 1),
cb AS (SELECT u, v, cast(count(*) AS bigint) AS nuv FROM bg GROUP BY 1, 2),
cu AS (SELECT u, sum(nuv) AS nu FROM cb GROUP BY 1),
vv AS (SELECT count(DISTINCT tok) AS v
       FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
lp AS (SELECT cb.u, cb.v,
              cast(round(ln((cb.nuv + 1.0)
                            / (cu.nu + (SELECT v FROM vv))) * 1e6)
                   AS bigint) AS lp
       FROM cb JOIN cu ON cu.u = cb.u)
SELECT bg.doc_id,
       cast(count(*) AS bigint) AS n_bigrams,
       cast(-sum(lp.lp) AS bigint) AS h_micronat_num,
       round(cast(-sum(lp.lp) AS double) / count(*) / 1e6, 6)
         AS cross_entropy_nats
FROM bg JOIN lp ON lp.u = bg.u AND lp.v = bg.v
GROUP BY bg.doc_id
ORDER BY bg.doc_id"""


@register(
    "bigram_perplexity_quality",
    oracle=_LM_ORACLE,
    tags=("text", "quality", "language-model"),
)
def bigram_perplexity_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy (nats/bigram) under the corpus add-one
    bigram LM, exact on the micro-nat lattice (module docstring). Lower =
    more typical of the corpus; the tails are the filter candidates."""
    d = load_table(spark, sf_dir, "documents")
    arr = d.select("doc_id", F.split(F.col("text"), " ").alias("a"))
    bg = arr.select(
        "doc_id",
        F.explode(F.expr(
            "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),"
            " (x, y) -> struct(x AS u, y AS v))")).alias("b")
    ).select("doc_id", F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    cb = bg.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("nuv"))
    cu = cb.groupBy("u").agg(F.sum("nuv").alias("nu"))
    vocab_n = (d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
               .agg(F.countDistinct("tok").alias("vsz")))
    lp = (cb.join(cu, "u").crossJoin(F.broadcast(vocab_n))
          .select("u", "v",
                  F.round(F.log((F.col("nuv") + 1.0)
                                / (F.col("nu") + F.col("vsz"))) * 1e6)
                   .cast("long").alias("lp")))
    return (bg.join(lp, ["u", "v"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 (-F.sum("lp")).cast("long").alias("h_micronat_num"),
                 F.round((-F.sum("lp")).cast("double")
                         / F.count(F.lit(1)) / 1e6, 6)
                  .alias("cross_entropy_nats"))
            .orderBy("doc_id"))
