"""Interpolated Kneser-Ney bigram perplexity per corpus source — the
production-grade upgrade of the add-one bigram filter (lm12.py), and the
smoothing KenLM actually ships for CCNet-style quality filtering. Add-one
wildly over-penalizes rare-but-real continuations; KN replaces the add-one
mass with absolute discounting plus a CONTINUATION unigram ("how many
distinct contexts does v follow?"), which is the right statistic for
boilerplate detection: a token glued to one context (half of a branded
phrase) gets low continuation probability even when frequent.

Model (bigram interpolated KN, fixed discount D = 0.75):

    P(v|u) = ( max(c(u,v) - D, 0) + D * N1+(u.) * Pcont(v) ) / c(u)
    Pcont(v) = N1+(.v) / B

with c(u,v) bigram counts, c(u) = sum_v c(u,v), N1+(u.) = distinct
continuations of u, N1+(.v) = distinct contexts preceding v, B = distinct
bigram types. Scoring the training corpus itself means every scored bigram
has c(u,v) >= 1 — the interpolation term still matters (that's the whole
point of the discount).

Micro-nat discipline (lm12/text11): each bigram TYPE's ln P is snapped
once to micro-nats; per-source totals ride exact bigints; the one final
division and exp() are identical expressions in both engines.

Scale stance (100 TB): bigrams come from the array slice-zip below the
explode (one corpus pass, no self-join, no window); all four count tables
are map-side-combinable aggregates keyed by token/bigram; scoring is one
equi-join of the (source, u, v) bigram stream against the bigram-type LM
table and one groupBy source. Nothing touches the driver but the
source-count rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_D_MICRO = 750_000       # absolute discount D = 0.75 on the micro lattice

_KN_ORACLE = """
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS a
              FROM documents),
tk AS (SELECT doc_id, source, unnest(a) AS tok,
              generate_subscripts(a, 1) AS i
       FROM toks),
bg AS (SELECT x.source, x.tok AS u, y.tok AS v
       FROM tk x JOIN tk y ON y.doc_id = x.doc_id AND y.i = x.i + 1),
cb AS (SELECT u, v, cast(count(*) AS bigint) AS nuv
       FROM bg GROUP BY 1, 2),
cu AS (SELECT u, sum(nuv) AS nu, cast(count(*) AS bigint) AS n1f
       FROM cb GROUP BY 1),
cv AS (SELECT v, cast(count(*) AS bigint) AS n1b FROM cb GROUP BY 1),
bb AS (SELECT cast(count(*) AS bigint) AS b FROM cb),
lp AS (SELECT cb.u, cb.v,
              cast(round(ln((greatest(cb.nuv - 0.75, 0)
                             + 0.75 * cu.n1f
                               * (cast(cv.n1b AS double)
                                  / (SELECT b FROM bb)))
                            / cu.nu) * 1e6) AS bigint) AS lp
       FROM cb JOIN cu ON cu.u = cb.u JOIN cv ON cv.v = cb.v)
SELECT bg.source,
       cast(count(*) AS bigint) AS n_bigrams,
       round(cast(-sum(lp.lp) AS double) / count(*) / 1e6, 6)
         AS cross_entropy_nats,
       round(exp(cast(-sum(lp.lp) AS double) / count(*) / 1e6), 6)
         AS perplexity
FROM bg JOIN lp ON lp.u = bg.u AND lp.v = bg.v
GROUP BY bg.source
ORDER BY bg.source"""


@register(
    "kneser_ney_perplexity_by_source",
    oracle=_KN_ORACLE,
    tags=("text", "quality", "language-model", "llm-pipeline"),
)
def kneser_ney_perplexity_by_source(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Per-source cross-entropy and perplexity under the corpus-trained
    interpolated Kneser-Ney bigram LM (module docstring), exact on the
    micro-nat lattice. Sources whose perplexity sits far from the corpus
    band are the mixture-weighting / contamination suspects."""
    d = load_table(spark, sf_dir, "documents")
    arr = d.select("source", F.split(F.col("text"), " ").alias("a"))
    bg = arr.select(
        "source",
        F.explode(F.expr(
            "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),"
            " (x, y) -> struct(x AS u, y AS v))")).alias("b")
    ).select("source", F.col("b.u").alias("u"), F.col("b.v").alias("v"))
    cb = bg.groupBy("u", "v").agg(F.count(F.lit(1)).cast("long").alias("nuv"))
    cu = cb.groupBy("u").agg(F.sum("nuv").alias("nu"),
                             F.count(F.lit(1)).cast("long").alias("n1f"))
    cv = cb.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    bb = cb.agg(F.count(F.lit(1)).cast("long").alias("b"))
    lp = (cb.join(cu, "u").join(cv, "v").crossJoin(F.broadcast(bb))
          .select("u", "v",
                  F.round(F.log(
                      (F.greatest(F.col("nuv") - 0.75, F.lit(0.0))
                       + 0.75 * F.col("n1f")
                       * (F.col("n1b").cast("double") / F.col("b")))
                      / F.col("nu")) * 1e6).cast("long").alias("lp")))
    h = (F.col("neg_lp_sum").cast("double") / F.col("n_bigrams") / 1e6)
    return (bg.join(lp, ["u", "v"])
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 (-F.sum("lp")).cast("long").alias("neg_lp_sum"))
            .select("source", "n_bigrams",
                    F.round(h, 6).alias("cross_entropy_nats"),
                    F.round(F.exp(h), 6).alias("perplexity"))
            .orderBy("source"))
