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
    per_doc = (scored.groupBy("doc_id")
               .agg(F.round(F.sum("s"), 6).alias("bm25")))
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
