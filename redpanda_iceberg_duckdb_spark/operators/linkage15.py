"""Fellegi-Sunter match/unmatch weights — the probabilistic record-
linkage scoring layer on top of the engine's blocking tier (LSH bands,
sorted-neighborhood, PPJoin): given candidate pairs from a blocker,
estimate per-field agreement odds and the log2 weight each field
contributes to a match score (Fellegi & Sunter 1969).

Estimation on the documents corpus:
- candidate pairs: the MinHash-LSH band candidates (dedup.py's exact
  pipeline — same signatures, same banding);
- fields: lang, source, and the n_chars length bucket (floor(n/50));
- m_f = P(field agrees | candidate pair) — exact ratio of bigint
  counts over the candidate set;
- u_f = P(field agrees | random pair) in closed form from the field's
  value histogram WITHOUT sampling: sum_v c_v*(c_v-1) / (N*(N-1))
  (unordered pairs cancel) — no random-pair join at any scale.

weight_f = log2(m_f / u_f), the bits of evidence an agreement on field
f contributes. Exact integer numerators/denominators; one double
division + log2 per field at the end (the repo's accepted 1-ulp libm
exposure).

Scale stance (100 TB): the blocker is the banded LSH equi-join (never
all-pairs); m sums are one aggregate over candidates joined twice to
the slim (doc_id, field) projection; u is a value-histogram aggregate
per field — three map-side-combinable passes, 3 output rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .dedup import _LSH_CAND_CTE_DUCK, lsh_candidates
from .shingles import _TG_CTE_DUCK, _doc_trigrams

_FIELDS_SQL = ("SELECT doc_id, lang, source, "
               "cast(floor(n_chars / 50.0) AS bigint) AS lenb "
               "FROM documents")

_FS_ORACLE = f"""
WITH {_TG_CTE_DUCK.strip().rstrip(',')},
{_LSH_CAND_CTE_DUCK.strip()},
f AS ({_FIELDS_SQL}),
pairs AS (
  SELECT sum(CASE WHEN fa.lang = fb.lang THEN 1 ELSE 0 END) AS ag_lang,
         sum(CASE WHEN fa.source = fb.source THEN 1 ELSE 0 END)
           AS ag_source,
         sum(CASE WHEN fa.lenb = fb.lenb THEN 1 ELSE 0 END) AS ag_lenb,
         cast(count(*) AS bigint) AS n_pairs
  FROM cand JOIN f fa ON fa.doc_id = cand.d1
            JOIN f fb ON fb.doc_id = cand.d2),
n AS (SELECT cast(count(*) AS bigint) AS n FROM f),
u AS (
  SELECT 'lang' AS field,
         (SELECT cast(sum(c * (c - 1)) AS bigint) FROM (
            SELECT count(*) AS c FROM f GROUP BY lang)) AS agree2
  UNION ALL
  SELECT 'source',
         (SELECT cast(sum(c * (c - 1)) AS bigint) FROM (
            SELECT count(*) AS c FROM f GROUP BY source))
  UNION ALL
  SELECT 'lenb',
         (SELECT cast(sum(c * (c - 1)) AS bigint) FROM (
            SELECT count(*) AS c FROM f GROUP BY lenb))),
m AS (
  SELECT 'lang' AS field, cast(ag_lang AS bigint) AS ag, n_pairs
  FROM pairs
  UNION ALL SELECT 'source', cast(ag_source AS bigint), n_pairs
  FROM pairs
  UNION ALL SELECT 'lenb', cast(ag_lenb AS bigint), n_pairs FROM pairs)
SELECT m.field, m.n_pairs, m.ag AS n_agree_cand,
       round(cast(m.ag AS double) / m.n_pairs, 6) AS m_prob,
       round(cast(u.agree2 AS double)
             / (cast(n.n AS double) * (n.n - 1)), 6) AS u_prob,
       round(ln((cast(m.ag AS double) / m.n_pairs)
                / (cast(u.agree2 AS double)
                   / (cast(n.n AS double) * (n.n - 1)))) / ln(2.0), 6)
         AS weight_bits
FROM m JOIN u ON u.field = m.field CROSS JOIN n
ORDER BY m.field"""


@register(
    "fellegi_sunter_weights",
    oracle=_FS_ORACLE,
    tags=("linkage", "dedup", "probabilistic"),
)
def fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(field, n_pairs, n_agree_cand, m_prob, u_prob, weight_bits):
    Fellegi-Sunter agreement weights for lang / source / length-bucket
    over the LSH candidate pairs (module docstring)."""
    tg = _doc_trigrams(spark, sf_dir)
    cand = lsh_candidates(tg)
    d = load_table(spark, sf_dir, "documents")
    f = d.select("doc_id", "lang", "source",
                 F.floor(F.col("n_chars") / 50.0).cast("long")
                 .alias("lenb"))
    fa = f.select(F.col("doc_id").alias("d1"),
                  F.col("lang").alias("la"), F.col("source").alias("sa"),
                  F.col("lenb").alias("ba"))
    fb = f.select(F.col("doc_id").alias("d2"),
                  F.col("lang").alias("lb"), F.col("source").alias("sb"),
                  F.col("lenb").alias("bb"))
    pairs = (cand.join(fa, "d1").join(fb, "d2")
             .agg(F.sum(F.when(F.col("la") == F.col("lb"), 1)
                        .otherwise(0)).cast("long").alias("ag_lang"),
                  F.sum(F.when(F.col("sa") == F.col("sb"), 1)
                        .otherwise(0)).cast("long").alias("ag_source"),
                  F.sum(F.when(F.col("ba") == F.col("bb"), 1)
                        .otherwise(0)).cast("long").alias("ag_lenb"),
                  F.count(F.lit(1)).cast("long").alias("n_pairs")))
    n = f.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def agree2(col: str):
        return (f.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
                .agg(F.sum(F.col("c") * (F.col("c") - 1)).cast("long")
                     .alias("agree2")))

    u = None
    for field in ("lang", "source", "lenb"):
        part = agree2(field).select(F.lit(field).alias("field"), "agree2")
        u = part if u is None else u.union(part)
    m = None
    for field, c in (("lang", "ag_lang"), ("source", "ag_source"),
                     ("lenb", "ag_lenb")):
        part = pairs.select(F.lit(field).alias("field"),
                            F.col(c).alias("ag"), "n_pairs")
        m = part if m is None else m.union(part)
    mp = F.col("ag").cast("double") / F.col("n_pairs")
    up = (F.col("agree2").cast("double")
          / (F.col("n").cast("double") * (F.col("n") - 1)))
    return (m.join(u, "field").crossJoin(F.broadcast(n))
            .select("field", "n_pairs",
                    F.col("ag").alias("n_agree_cand"),
                    F.round(mp, 6).alias("m_prob"),
                    F.round(up, 6).alias("u_prob"),
                    F.round(F.log(mp / up) / F.log(F.lit(2.0)), 6)
                    .alias("weight_bits"))
            .orderBy("field"))
