"""Self-BLEU-2 per source — the generation-diversity audit (Zhu et al.
2018 'Texygen'): how much each document's bigrams are covered by the REST
of its source. High self-BLEU = a templated/mode-collapsed source; the
curation signal that complements ROUGE-2 (pairwise overlap) and the
boilerplate detectors (exact shared prefixes).

Pairwise-free formulation (the scale insight): BLEU's clipped counts
against 'all other docs as references' need, per (source, gram), only
the TOP-2 per-doc counts — clip(doc) = min(c_doc, m1) unless doc is the
UNIQUE maximum holder, in which case min(c_doc, m2). That turns the
naive docs^2 comparison into one vocabulary-sized aggregate + one join —
sum over cells, never a pair join.

Exactness: counts are integers; each doc's precision is snapped to
micros with the integer round-half-up identity (2a+b)//(2b) — no floats
until the per-source mean (one division, rounded at 6). Brevity penalty
is omitted (references are corpus-sized, BP = 1 for any real document;
stated rather than silently approximated).

Scale stance (100 TB): bigram counting is map-side; per-(source, gram)
top-2 stats are one combinable aggregate keyed by the same (source,
gram) the counts already shuffle on; per-doc sums reuse that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table_spread
from .rouge14 import _BG_SPARK

_SB_ORACLE = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
bg AS (SELECT doc_id, source, g, cast(count(*) AS bigint) AS c
       FROM (SELECT doc_id, source, ws[i+1] || ' ' || ws[i+2] AS g
             FROM w, unnest(range(greatest(len(ws) - 1, 0))) r(i))
       GROUP BY 1, 2, 3),
gmax AS (SELECT source, g, max(c) AS m1 FROM bg GROUP BY 1, 2),
gstats AS (SELECT b.source, b.g, mx.m1,
                  sum(CASE WHEN b.c = mx.m1 THEN 1 ELSE 0 END) AS n1,
                  max(CASE WHEN b.c < mx.m1 THEN b.c END) AS m2
           FROM bg b JOIN gmax mx USING (source, g)
           GROUP BY 1, 2, 3),
clipped AS (
  SELECT b.doc_id, b.source, b.c,
         least(b.c, CASE WHEN b.c < s.m1 OR s.n1 > 1 THEN s.m1
                         ELSE coalesce(s.m2, 0) END) AS clip
  FROM bg b JOIN gstats s USING (source, g)),
perdoc AS (
  SELECT doc_id, source, sum(c) AS tot, sum(clip) AS mat
  FROM clipped GROUP BY 1, 2),
snapped AS (
  SELECT source,
         (2 * 1000000 * mat + tot) // (2 * tot) AS p2_micro
  FROM perdoc WHERE tot > 0)
SELECT source, cast(count(*) AS bigint) AS n_docs,
       round(cast(sum(p2_micro) AS double) / count(*) / 1e6, 6)
         AS self_bleu2
FROM snapped GROUP BY source ORDER BY source"""


@register(
    "self_bleu2_by_source",
    oracle=_SB_ORACLE,
    tags=("text", "diversity", "evaluation", "scale-pattern"),
)
def self_bleu2_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean clipped bigram precision of each doc against the rest of its
    source (module docstring): (source, n_docs, self_bleu2). Per-doc
    precisions ride an integer micro lattice; one division per source."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    words = d.select("doc_id", "source", F.split("text", " ").alias("ws"))
    bg = (words.select("doc_id", "source",
                       F.explode_outer(F.expr(_BG_SPARK)).alias("g"))
          .filter(F.col("g").isNotNull())
          .groupBy("doc_id", "source", "g")
          .agg(F.count(F.lit(1)).alias("c")))
    gmax = bg.groupBy("source", "g").agg(F.max("c").alias("m1"))
    gstats = (bg.join(gmax, ["source", "g"])
              .groupBy("source", "g", "m1")
              .agg(F.sum(F.when(F.col("c") == F.col("m1"), 1).otherwise(0))
                   .alias("n1"),
                   F.max(F.when(F.col("c") < F.col("m1"), F.col("c")))
                   .alias("m2")))
    clip = F.least(
        F.col("c"),
        F.when((F.col("c") < F.col("m1")) | (F.col("n1") > 1), F.col("m1"))
         .otherwise(F.coalesce(F.col("m2"), F.lit(0))))
    perdoc = (bg.join(gstats, ["source", "g"])
              .groupBy("doc_id", "source")
              .agg(F.sum("c").alias("tot"), F.sum(clip).alias("mat")))
    snapped = (perdoc.filter(F.col("tot") > 0)
               .select("source",
                       F.expr("(2 * 1000000 * mat + tot) div (2 * tot)")
                       .alias("p2_micro")))
    return (snapped.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.round(F.sum("p2_micro").cast("double")
                         / F.count(F.lit(1)) / F.lit(1e6), 6)
                 .alias("self_bleu2"))
            .orderBy("source"))
