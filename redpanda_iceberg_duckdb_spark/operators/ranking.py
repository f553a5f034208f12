"""Lexical retrieval primitives over the documents table: Okapi BM25
scoring and an inverted-index posting summary.

Reference scope: the reference engine exposes ad-hoc SQL over its tables
(/root/reference/duckdb/query_and_publish.py); full-text ranking is the
natural extension a corpus-curation user asks for first (retrieval-based
dedup triage, query-focused corpus slicing). BM25 is the public Robertson/
Sparck-Jones weighting (k1=1.2, b=0.75 — the standard defaults).

Scale stance (100 TB):
- Everything is counts: tf per (doc, term), df per term, doc length — all
  map-side combinable aggregates over one tokenization pass; no row ever
  carries more than a few integers.
- The query-term set is tiny and BROADCAST onto the tf table, so scoring is
  a map-side filter+join over the per-doc term counts — linear in corpus
  token count, one shuffle for the per-doc score sum.
- Corpus constants (N, avgdl) travel as a broadcast scalar crossJoin, never
  a window over a single partition.
- Top-k is TakeOrderedAndProject (rank on the ROUNDED score so the
  cross-engine comparison and the ordering agree bit-for-bit).

Testdata note: the synthetic corpus has a ~31-token vocabulary, so idf
spread is small; the rarest-5 selection rule still exercises the full BM25
computation and is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_K1 = 1.2
_B = 0.75
_N_QTERMS = 5   # the rarest 5 tokens (df asc, token asc) play the query
_TOPK = 10

_BM25_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, cast(sum(dl) AS bigint) AS sum_dl
          FROM dl),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
qterms AS (SELECT tok, df FROM dft ORDER BY df, tok LIMIT {_N_QTERMS}),
scored AS (
    SELECT tf.doc_id,
           ln((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
             * (tf.tf * ({_K1} + 1))
             / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl * stats.n_docs
                                 / stats.sum_dl)) AS s
    FROM tf JOIN qterms q USING (tok)
            JOIN dl USING (doc_id)
            CROSS JOIN stats),
per_doc AS (SELECT doc_id, round(sum(s), 6) AS bm25
            FROM scored GROUP BY doc_id),
ranked AS (SELECT doc_id, bm25,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
           FROM per_doc)
SELECT doc_id, bm25 FROM ranked WHERE rn <= {_TOPK} ORDER BY doc_id"""


def bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every doc containing a query term — the scoring
    stage shared by bm25_topk_docs and the RRF fusion query."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").cast("bigint").alias("sum_dl"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qterms = dft.orderBy("df", "tok").limit(_N_QTERMS)
    # Same parenthesization as the oracle so the doubles agree to the ulp
    # before the final round.
    s = (F.log((F.col("n_docs") - F.col("df") + 0.5)
               / (F.col("df") + 0.5) + 1)
         * (F.col("tf") * (_K1 + 1))
         / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl")
                                 * F.col("n_docs") / F.col("sum_dl"))))
    scored = (tf.join(F.broadcast(qterms), "tok")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", s.alias("s")))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum("s"), 6).alias("bm25")))


@register(
    "bm25_topk_docs",
    oracle=_BM25_ORACLE,
    tags=("retrieval", "ranking", "text"),
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by Okapi BM25 against the corpus's 5 rarest tokens
    (a deterministic stand-in for a user query). Module docstring has the
    broadcast/shuffle layout; ranking is on the rounded score so ordering
    is ulp-stable across engines."""
    per_doc = bm25_per_doc(spark, sf_dir)
    # Distributed top-k (TakeOrderedAndProject), NOT a global row_number
    # window — an unpartitioned window funnels every doc through one task.
    return (per_doc.orderBy(F.desc("bm25"), "doc_id").limit(_TOPK)
            .orderBy("doc_id"))


_POSTINGS_ORACLE = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
agg AS (SELECT tok,
               count(*) AS df,
               cast(sum(tf) AS bigint) AS total_tf,
               array_to_string(list_sort(list(doc_id))[1:5], '|')
                   AS first_postings
        FROM tf GROUP BY tok)
SELECT tok, df, total_tf, first_postings FROM agg ORDER BY tok"""


@register(
    "inverted_index_postings",
    oracle=_POSTINGS_ORACLE,
    tags=("retrieval", "index", "text"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build summary: per token, document frequency, total
    term frequency, and the head of the (sorted) posting list. At 100 TB
    the posting LIST per token is the thing you shard (posting segments per
    token-range bucket); this query is the bookkeeping pass — one explode,
    one two-key aggregate, one per-token aggregate, all map-side
    combinable. Postings travel as a bounded slice (first 5), never the
    full list, so no token's row can blow up on a hot term."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    return (tf.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.sum("tf").cast("bigint").alias("total_tf"),
                 F.concat_ws(
                     "|", F.slice(F.sort_array(F.collect_list("doc_id")),
                                  1, 5)).alias("first_postings"))
            .orderBy("tok"))


_RRF_K = 60
_RRF_POOL = 100   # fuse each system's top-100 only (the production bound)

_RRF_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, cast(sum(dl) AS bigint) AS sum_dl
          FROM dl),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
qterms AS (SELECT tok, df FROM dft ORDER BY df, tok LIMIT {_N_QTERMS}),
scored AS (
    SELECT tf.doc_id,
           ln((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
             * (tf.tf * ({_K1} + 1))
             / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl * stats.n_docs
                                 / stats.sum_dl)) AS s
    FROM tf JOIN qterms q USING (tok)
            JOIN dl USING (doc_id)
            CROSS JOIN stats),
bper AS (SELECT doc_id, round(sum(s), 6) AS bm25
         FROM scored GROUP BY doc_id),
b100 AS (SELECT doc_id, bm25 FROM bper
         ORDER BY bm25 DESC, doc_id LIMIT {_RRF_POOL}),
br AS (SELECT doc_id,
              row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
       FROM b100),
ct AS (SELECT tok, cast(sum(tf) AS bigint) AS c FROM tf GROUP BY tok),
tot AS (SELECT cast(sum(c) AS bigint) AS total FROM ct),
lpd AS (SELECT tf.doc_id,
               sum(tf.tf * ln(ct.c)) / sum(tf.tf) - ln(max(tot.total))
                   AS lp
        FROM tf JOIN ct USING (tok) CROSS JOIN tot
        GROUP BY tf.doc_id),
q100 AS (SELECT doc_id, lp FROM lpd ORDER BY lp DESC, doc_id
         LIMIT {_RRF_POOL}),
qr AS (SELECT doc_id,
              row_number() OVER (ORDER BY lp DESC, doc_id) AS r_quality
       FROM q100),
fused AS (SELECT coalesce(br.doc_id, qr.doc_id) AS doc_id,
                 br.r_bm25, qr.r_quality,
                 coalesce(1.0 / ({_RRF_K} + br.r_bm25), 0)
                   + coalesce(1.0 / ({_RRF_K} + qr.r_quality), 0) AS rrf
          FROM br FULL OUTER JOIN qr ON br.doc_id = qr.doc_id),
top AS (SELECT doc_id, r_bm25, r_quality, round(rrf, 6) AS rrf
        FROM fused ORDER BY rrf DESC, doc_id LIMIT 10)
SELECT doc_id, r_bm25, r_quality, rrf FROM top ORDER BY doc_id"""


@register(
    "rrf_fusion_topk",
    oracle=_RRF_ORACLE,
    tags=("retrieval", "ranking", "fusion"),
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009 — the standard
    score-free way to combine retrieval systems) of two independent
    rankings: BM25 relevance and unigram-LM quality. RRF(d) =
    Σ 1/(60 + rank_i(d)) over the systems that ranked d in their top-100.

    Determinism: RRF consumes integer RANKS, not scores — 1/(60+r) is a
    correctly-rounded division of exact ints, identical in both engines,
    so fusion needs none of the float discipline scores do; that rank
    robustness is exactly why RRF is the default fusion baseline.

    Scale stance: each system contributes only its TOP-{_RRF_POOL}
    (distributed TakeOrdered), so the rank windows and the full-outer
    fusion join run over bounded pools regardless of corpus size — the
    per-system score passes remain the only corpus-scale work."""
    from pyspark.sql import Window as W

    b100 = (bm25_per_doc(spark, sf_dir)
            .orderBy(F.desc("bm25"), "doc_id").limit(_RRF_POOL))
    br = b100.withColumn("r_bm25", F.row_number().over(
        W.orderBy(F.desc("bm25"), "doc_id"))).select("doc_id", "r_bm25")
    # Rank quality on the UNROUNDED decomposition, mirroring the oracle's
    # lpd expression exactly (the registered unigram_logprob_quality query
    # rounds for display; ordering must come from the same doubles in both
    # engines, so the unrounded score is rebuilt here).
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    ct = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("c"))
    tot = ct.agg(F.sum("c").cast("bigint").alias("total"))
    lp = (tf.join(ct, "tok").crossJoin(F.broadcast(tot))
          .groupBy("doc_id")
          .agg((F.sum(F.col("tf") * F.log("c")) / F.sum("tf")
                - F.log(F.max("total"))).alias("lp_r")))
    q100 = lp.orderBy(F.desc("lp_r"), "doc_id").limit(_RRF_POOL)
    qr = q100.withColumn("r_quality", F.row_number().over(
        W.orderBy(F.desc("lp_r"), "doc_id"))).select("doc_id", "r_quality")
    fused = (br.join(qr, "doc_id", "full_outer")
             .withColumn("rrf",
                         F.coalesce(1.0 / (_RRF_K + F.col("r_bm25")),
                                    F.lit(0.0))
                         + F.coalesce(1.0 / (_RRF_K + F.col("r_quality")),
                                      F.lit(0.0))))
    return (fused.orderBy(F.desc("rrf"), "doc_id").limit(10)
            .select("doc_id", "r_bm25", "r_quality",
                    F.round("rrf", 6).alias("rrf"))
            .orderBy("doc_id"))
