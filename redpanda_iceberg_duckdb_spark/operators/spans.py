"""Exact shared-substring detection between documents via positional n-gram
runs — the practical form of the suffix-array substring dedup from Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better" (public
arXiv:2107.06499): two documents share a verbatim span of >= R+2 words iff
they share R consecutive positional word-trigrams on a common diagonal.

Pipeline (both engines, identical semantics):
1. positional trigrams (doc_id, pos, tg) — NOT deduplicated; position is
   the signal here.
2. document-frequency cap: trigrams appearing in > 16 documents are dropped
   (boilerplate/stopword runs). Exactness note: a cap this small cannot hide
   a real verbatim span unless that span is ALREADY shared by 16+ docs — at
   which point any one pair of them is boilerplate, not duplication.
3. equi-join on tg across doc pairs (d1 < d2), keyed by the match diagonal
   diag = pos_a - pos_b: consecutive shared trigrams on one diagonal are a
   verbatim shared span.
4. islands: per (d1, d2, diag), consecutive pos_a values group by
   pos_a - row_number() — the classic gaps-and-islands trick; the longest
   island is the longest shared span.

Scale stance: the df-cap is applied in Spark as a broadcast ANTI-join against
the HOT gram list (grams with df > 16 — a tiny stopword-like set) rather
than an inner join against the full df table: the hot list fits in a
broadcast at any corpus size, so the cap costs one map-side filter, not a
corpus-wide shuffle. The pair join then only touches rare grams, which is
what bounds the quadratic — exactly the frequency-capping argument of the
LSH dfcap variant (dedup.py). Window partitioning is per (d1, d2, diag):
parallel across pairs, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table_spread
from .shingles import _TG_ARRAY_SPARK

_DF_CAP = 16   # grams in more docs than this are boilerplate, not signal
_MIN_RUN = 8   # >= 8 consecutive shared trigrams == >= 10 shared words

_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
pos AS (SELECT doc_id, i AS p, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS tg
        FROM w, unnest(range(greatest(len(ws) - 2, 0))) r(i)),
df AS (SELECT tg, count(DISTINCT doc_id) AS ndocs FROM pos GROUP BY tg),
rare AS (SELECT p.* FROM pos p JOIN df USING (tg) WHERE df.ndocs <= {_DF_CAP}),
m AS (SELECT a.doc_id d1, b.doc_id d2, a.p pa, a.p - b.p AS diag
      FROM rare a JOIN rare b ON a.tg = b.tg AND a.doc_id < b.doc_id),
isl AS (SELECT d1, d2, diag,
               pa - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY pa)
                   AS isl_id
        FROM m),
runs AS (SELECT d1, d2, count(*) AS run FROM isl GROUP BY d1, d2, diag, isl_id),
best AS (SELECT d1, d2, max(run) AS max_run_tg FROM runs GROUP BY d1, d2)
SELECT d1, d2, max_run_tg, max_run_tg + 2 AS span_words
FROM best WHERE max_run_tg >= {_MIN_RUN} ORDER BY d1, d2"""


@register(
    "shared_ngram_span_pairs",
    oracle=_ORACLE,
    tags=("dedup", "substring", "spans"),
)
def shared_ngram_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing a verbatim span of >= 10 words, with the exact
    longest-shared-span length (in trigrams and words). Module docstring has
    the diagonal-islands construction and the broadcast-anti df-cap that
    keeps the pair join rare-gram-only at scale."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    # Not persisted: the explode lineage is recomputed per consumer, but it
    # is pure map-side codegen — measured at sf0.1, caching it costs more
    # (materialize + memory-scan) than recomputing.
    # posexplode_outer + post-filter: see shingles._doc_trigrams — avoids
    # the inferred Generate predicate re-running the transform at the scan.
    pos = (d.select("doc_id", F.split("text", " ").alias("ws"))
           .select("doc_id",
                   F.posexplode_outer(F.expr(_TG_ARRAY_SPARK))
                    .alias("p", "tg"))
           .filter(F.col("tg").isNotNull()))
    hot = (pos.groupBy("tg")
           .agg(F.countDistinct("doc_id").alias("ndocs"))
           .filter(F.col("ndocs") > _DF_CAP)
           .select("tg"))
    rare = pos.join(F.broadcast(hot), "tg", "left_anti")
    a = rare.select(F.col("doc_id").alias("d1"), F.col("p").alias("pa"), "tg")
    b = rare.select(F.col("doc_id").alias("d2"), F.col("p").alias("pb"), "tg")
    # No distinct: a document position holds exactly one trigram, so each
    # (d1, d2, pa, diag) cell can match at most once — dedup here would be
    # a no-op costing a full shuffle of the largest intermediate.
    m = (a.join(b, "tg")
         .filter(F.col("d1") < F.col("d2"))
         .select("d1", "d2", "pa", (F.col("pa") - F.col("pb")).alias("diag")))
    rn = W.partitionBy("d1", "d2", "diag").orderBy("pa")
    isl = m.select("d1", "d2", "diag",
                   (F.col("pa") - F.row_number().over(rn)).alias("isl_id"))
    runs = (isl.groupBy("d1", "d2", "diag", "isl_id")
            .agg(F.count(F.lit(1)).alias("run")))
    return (runs.groupBy("d1", "d2")
            .agg(F.max("run").alias("max_run_tg"))
            .filter(F.col("max_run_tg") >= _MIN_RUN)
            .select("d1", "d2", "max_run_tg",
                    (F.col("max_run_tg") + 2).alias("span_words"))
            .orderBy("d1", "d2"))
