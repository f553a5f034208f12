"""Repetition-based quality signals in the Gopher / MassiveText style
(Rae et al. 2021, arXiv:2112.11446 Table A1): documents dominated by a few
repeated n-grams are machine-generated boilerplate, and the standard
pre-training filters threshold on (a) the frequency mass of the single most
frequent n-gram and (b) the fraction of positions covered by n-grams that
repeat WITHIN the document. Complements contamination.doc_repetition_score
(a single distinct/total trigram ratio) with the per-signal decomposition
filters actually threshold on, and substring_dedup.py (CROSS-document
spans) with the within-document span extractor.

Word-mass variants: the corpus is single-line word streams (TESTDATA.md),
so signals are word-positional rather than character-mass — same filter
shape, cleaner exact semantics (no whitespace-width ambiguity).

Scale stance (100 TB): everything is per-document group work — one explode
to (doc, pos, gram), one groupBy(doc, gram) with map-side combine, one
per-doc aggregate; documents bound every window partition. No cross-doc
join exists in either query, so corpus size only widens the shuffle, never
changes its shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table_spread

_TOP = 50

_BG_ARRAY_SPARK = (
    "case when size(ws) >= 2 then "
    "transform(sequence(0, size(ws) - 2), i -> "
    "concat_ws(' ', ws[i], ws[i + 1])) "
    "else array() end"
)

# Self-repetition operates at a SHORTER gram scale than cross-document
# dedup (substring_dedup's K=8): a doc repeating its own 8-gram verbatim
# is rare even in sloppy corpora, while 3-gram self-repeats are the
# realistic looped-generation signature (Gopher's own dup-gram family
# spans n=2..10 for the same reason). Measured on the corpus: 8-grams
# find 0 self-dup docs, 3-grams find ~5%.
_SELF_K = 3

_SK_ARRAY_SPARK = (
    f"case when size(ws) >= {_SELF_K} then "
    f"transform(sequence(0, size(ws) - {_SELF_K}), i -> "
    "concat_ws(' ', " + ", ".join(f"ws[i + {j}]" for j in range(_SELF_K))
    + ")) else array() end"
)


def _self_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, sh): positional _SELF_K-gram shingles."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    return (d.select("doc_id", F.split("text", " ").alias("ws"))
            .select("doc_id",
                    F.posexplode_outer(F.expr(_SK_ARRAY_SPARK))
                     .alias("pos", "sh"))
            .filter(F.col("sh").isNotNull()))

_GOPHER_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
bg AS (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS g
       FROM w, unnest(range(greatest(len(ws) - 1, 0))) r(i)),
bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
topbg AS (SELECT doc_id, c, g,
                 sum(c) OVER (PARTITION BY doc_id) AS total,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY c DESC, g) AS rn
          FROM bgc),
p AS (SELECT doc_id, i AS pos,
             array_to_string(ws[i+1:i+{_SELF_K}], ' ') AS sh
      FROM w, unnest(range(greatest(len(ws) - {_SELF_K} + 1, 0))) r(i)),
pc AS (SELECT doc_id, sh, count(*) AS c FROM p GROUP BY doc_id, sh),
dup3 AS (SELECT doc_id,
                cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS bigint)
                  AS dup_pos,
                cast(sum(c) AS bigint) AS n_pos
         FROM pc GROUP BY doc_id)
SELECT t.doc_id,
       cast(len(w.ws) AS bigint) AS n_words,
       t.g AS top_bigram,
       round(t.c * 1.0 / t.total, 6) AS top_bigram_frac,
       round(coalesce(d.dup_pos, 0) * 1.0 / greatest(d.n_pos, 1), 6)
         AS dup3_pos_frac
FROM topbg t
JOIN w ON w.doc_id = t.doc_id
LEFT JOIN dup3 d ON d.doc_id = t.doc_id
WHERE t.rn = 1
ORDER BY t.doc_id"""


@register(
    "gopher_repetition_signals",
    oracle=_GOPHER_ORACLE,
    tags=("text", "quality", "llm-pipeline"),
)
def gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition filter inputs: the frequency mass of the
    most frequent bigram (top_bigram_frac, ties to the lexicographically
    smallest bigram) and the fraction of 3-gram positions whose shingle
    repeats within the document (dup3_pos_frac) — the two thresholds a
    Gopher-rule cleaner applies before anything cross-document runs."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    words = d.select("doc_id", F.split("text", " ").alias("ws"))
    nw = words.select("doc_id", F.size("ws").cast("long").alias("n_words"))
    bg = (words.select("doc_id",
                       F.explode_outer(F.expr(_BG_ARRAY_SPARK)).alias("g"))
          .filter(F.col("g").isNotNull()))
    bgc = bg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    wtot = W.partitionBy("doc_id")
    wrank = W.partitionBy("doc_id").orderBy(F.desc("c"), "g")
    topbg = (bgc.withColumn("total", F.sum("c").over(wtot))
             .withColumn("rn", F.row_number().over(wrank))
             .filter(F.col("rn") == 1)
             .select("doc_id", F.col("g").alias("top_bigram"),
                     F.round(F.col("c") / F.col("total"), 6)
                      .alias("top_bigram_frac")))
    p = _self_shingles(spark, sf_dir)
    pc = p.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("c"))
    dup3 = (pc.groupBy("doc_id")
            .agg(F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                 .cast("long").alias("dup_pos"),
                 F.sum("c").cast("long").alias("n_pos")))
    return (topbg.join(nw, "doc_id")
            .join(dup3, "doc_id", "left")
            .select("doc_id", "n_words", "top_bigram", "top_bigram_frac",
                    F.round(F.coalesce("dup_pos", F.lit(0))
                            / F.greatest(F.coalesce("n_pos", F.lit(0)),
                                         F.lit(1)), 6)
                    .alias("dup3_pos_frac"))
            .orderBy("doc_id"))


_INTRA_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
p AS (SELECT doc_id, i AS pos,
             array_to_string(ws[i+1:i+{_SELF_K}], ' ') AS sh
      FROM w, unnest(range(greatest(len(ws) - {_SELF_K} + 1, 0))) r(i)),
selfdup AS (SELECT doc_id, sh FROM p
            GROUP BY doc_id, sh HAVING count(*) >= 2),
d AS (SELECT p.doc_id, p.pos,
             row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS rn
      FROM p JOIN selfdup s ON s.doc_id = p.doc_id AND s.sh = p.sh),
sp AS (SELECT doc_id, pos - rn AS grp, count(*) AS run_len
       FROM d GROUP BY doc_id, pos - rn),
agg AS (SELECT doc_id,
               cast(count(*) AS bigint) AS n_spans,
               cast(max(run_len + {_SELF_K} - 1) AS bigint)
                 AS max_span_tokens
        FROM sp GROUP BY doc_id)
SELECT doc_id, n_spans, max_span_tokens
FROM agg ORDER BY max_span_tokens DESC, doc_id LIMIT {_TOP}"""


@register(
    "intra_doc_repeated_spans",
    oracle=_INTRA_ORACLE,
    tags=("text", "dedup", "substring", "llm-pipeline"),
)
def intra_doc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated spans: maximal runs of consecutive 3-gram
    positions whose shingle occurs at least twice in the same document —
    the self-repetition extractor (looped generation, copy-paste padding)
    next to substring_dedup's cross-document cut-list. Same islands-and-
    gaps machinery, dup flag scoped per document, gram scale dropped to
    {_SELF_K} (see the _SELF_K note); top {_TOP} docs by longest
    self-repeated span."""
    p = _self_shingles(spark, sf_dir)
    selfdup = (p.groupBy("doc_id", "sh")
               .agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") >= 2).select("doc_id", "sh"))
    dpos = p.join(selfdup, ["doc_id", "sh"]).select("doc_id", "pos")
    w = W.partitionBy("doc_id").orderBy("pos")
    spans = (dpos.withColumn("rn", F.row_number().over(w))
             .withColumn("grp", F.col("pos") - F.col("rn"))
             .groupBy("doc_id", "grp")
             .agg(F.count(F.lit(1)).alias("run_len")))
    return (spans.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 (F.max("run_len") + F.lit(_SELF_K - 1)).cast("bigint")
                 .alias("max_span_tokens"))
            .orderBy(F.desc("max_span_tokens"), "doc_id")
            .limit(_TOP))