"""Rocchio pseudo-relevance feedback (Rocchio 1971; the classic query
expansion every lexical retrieval stack ships next to BM25) plus a
tokenizer-fertility profile — round-11 retrieval/text additions.

Rocchio: score the corpus with BM25 against the 5 rarest tokens (the
deterministic stand-in query of ranking.py), take the top-3 documents as
the pseudo-relevant set, expand the query with their 3 strongest
non-query terms at half weight (beta = 0.5), and re-rank. The checkable
fact is the FULL feedback loop: both engines must pick the same
pseudo-relevant docs, the same expansion terms, and the same re-ranked
top-10 — rank on the 6-decimal rounded score with doc_id tie-breaks at
every stage, so ordering is ulp-stable (the ranking.py discipline).

Fertility: tokens-per-word and chars-per-token by document language —
the number a tokenizer team budgets per locale (a high-fertility
language pays more sequence length for the same text). Words are the
whitespace split; tokens are the BPE-ish pre-tokenizer regex of
token_count_regex (word runs / digit runs / punctuation singletons).

Scale stance (100 TB): everything is counts from ONE tokenization pass
(tf / dl / df / per-lang sums — map-side combinable); the query-term and
expansion frames are <= 8 rows and BROADCAST; top-k stages are
distributed TakeOrdered, never a global window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_K1 = 1.2
_B = 0.75
_N_QTERMS = 5
_N_REL = 3        # pseudo-relevant documents
_N_EXP = 3        # expansion terms
_BETA = 0.5       # expansion-term weight
_TOPK = 10

# Shared oracle plumbing: one tokenization pass -> tf / dl / stats / df.
_TF_CTES = """
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, cast(sum(dl) AS bigint) AS sum_dl
          FROM dl),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)"""

# BM25 term score with the ranking.py parenthesization (w = term weight).
_TERM = (f"ln((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)"
         f" * (tf.tf * ({_K1} + 1))"
         f" / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl * stats.n_docs"
         f" / stats.sum_dl))")


def _rocchio_oracle() -> str:
    return f"""
WITH {_TF_CTES},
q0 AS (SELECT tok, df, 1.0 AS w FROM dft
       ORDER BY df, tok LIMIT {_N_QTERMS}),
s0 AS (SELECT tf.doc_id, round(sum({_TERM} * q.w), 6) AS s
       FROM tf JOIN q0 q USING (tok) JOIN dl USING (doc_id)
       CROSS JOIN stats GROUP BY tf.doc_id),
rel AS (SELECT doc_id FROM s0 ORDER BY s DESC, doc_id LIMIT {_N_REL}),
exp AS (SELECT tf.tok, d.df, {_BETA} AS w
        FROM tf JOIN rel USING (doc_id) JOIN dft d USING (tok)
        WHERE tf.tok NOT IN (SELECT tok FROM q0)
        GROUP BY tf.tok, d.df
        ORDER BY sum(tf.tf) DESC, tf.tok LIMIT {_N_EXP}),
q1 AS (SELECT * FROM q0 UNION ALL SELECT * FROM exp),
s1 AS (SELECT tf.doc_id, round(sum({_TERM} * q.w), 6) AS s
       FROM tf JOIN q1 q USING (tok) JOIN dl USING (doc_id)
       CROSS JOIN stats GROUP BY tf.doc_id),
ranked AS (SELECT doc_id, s,
                  row_number() OVER (ORDER BY s DESC, doc_id) AS rn
           FROM s1)
SELECT doc_id, s AS bm25_fb FROM ranked WHERE rn <= {_TOPK}
ORDER BY doc_id"""


def _score(tf: DataFrame, dl: DataFrame, stats: DataFrame,
           qterms: DataFrame) -> DataFrame:
    """(doc_id, s): weighted BM25 sum against a broadcast (tok, df, w)
    query frame — the ranking.py scoring shape."""
    s = (F.log((F.col("n_docs") - F.col("df") + 0.5)
               / (F.col("df") + 0.5) + 1)
         * (F.col("tf") * (_K1 + 1))
         / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl")
                                 * F.col("n_docs") / F.col("sum_dl")))
         * F.col("w"))
    return (tf.join(F.broadcast(qterms), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select("doc_id", s.alias("s"))
            .groupBy("doc_id")
            .agg(F.round(F.sum("s"), 6).alias("s")))


@register(
    "rocchio_feedback_topk",
    oracle=_rocchio_oracle(),
    tags=("retrieval", "ranking", "text", "scale-pattern"),
)
def rocchio_feedback_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25_fb): top-10 documents after ONE round of Rocchio
    pseudo-relevance feedback — initial BM25 on the 5 rarest tokens,
    expansion with the pseudo-relevant top-3's 3 strongest new terms at
    half weight, re-rank (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # r15 optimization (guide §2.3/§2.4): tf feeds BOTH scoring passes,
    # the df table, and the expansion-term mining — plus dl re-exploded
    # the corpus again. localCheckpoint tf once (distinct (doc, token)
    # cardinality) and derive dl as its exact integer marginal
    # (sum tf == count of tokens per doc): ~6 token-stream evaluations
    # -> 1 explode + cheap re-aggregates of the checkpointed frame.
    tf = (toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
          # eager: see dsir note — concurrent branches of one action
          # race-compute a lazy checkpoint (r12 lesson)
          .localCheckpoint(eager=True))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").cast("bigint").alias("sum_dl"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    q0 = (dft.orderBy("df", "tok").limit(_N_QTERMS)
          .withColumn("w", F.lit(1.0)))
    s0 = _score(tf, dl, stats, q0)
    rel = (s0.orderBy(F.desc("s"), "doc_id").limit(_N_REL)
           .select("doc_id"))
    exp = (tf.join(F.broadcast(rel), "doc_id")
           .join(q0.select("tok"), "tok", "left_anti")
           .groupBy("tok").agg(F.sum("tf").alias("reltf"))
           .join(dft, "tok")
           .orderBy(F.desc("reltf"), "tok").limit(_N_EXP)
           .select("tok", "df", F.lit(_BETA).alias("w")))
    q1 = q0.select("tok", "df", "w").unionByName(exp)
    s1 = _score(tf, dl, stats, q1)
    return (s1.orderBy(F.desc("s"), "doc_id").limit(_TOPK)
            .select("doc_id", F.col("s").alias("bm25_fb"))
            .orderBy("doc_id"))


_TOK_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
WITH per_doc AS (
  SELECT lang,
         len(string_split(text, ' ')) AS words,
         len(regexp_extract_all(text, '{_TOK_RE}')) AS toks,
         length(replace(text, ' ', '')) AS chars
  FROM documents)
SELECT lang, cast(count(*) AS bigint) AS n_docs,
       cast(sum(words) AS bigint) AS n_words,
       cast(sum(toks) AS bigint) AS n_tokens,
       round(sum(toks) * 1.0 / sum(words), 6) AS fertility,
       round(sum(chars) * 1.0 / sum(toks), 6) AS chars_per_token
FROM per_doc GROUP BY lang ORDER BY lang""",
    tags=("text", "tokenizer"),
)
def tokenizer_fertility_by_lang(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_words, n_tokens, fertility, chars_per_token):
    BPE-ish tokens per whitespace word and non-space chars per token by
    document language — the per-locale sequence-length budget a
    tokenizer team reads (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.size(F.split("text", " ")).alias("words"),
        F.size(F.expr(f"regexp_extract_all(text, '{_TOK_RE}', 0)"))
        .alias("toks"),
        F.length(F.regexp_replace("text", " ", "")).alias("chars"))
    return (per.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("words").cast("long").alias("n_words"),
                 F.sum("toks").cast("long").alias("n_tokens"),
                 F.round(F.sum("toks") * 1.0 / F.sum("words"), 6)
                 .alias("fertility"),
                 F.round(F.sum("chars") * 1.0 / F.sum("toks"), 6)
                 .alias("chars_per_token"))
            .orderBy("lang"))
