"""Content-novelty curve: process the corpus in fixed ingestion buckets
(doc_id order, 50 docs each) and measure how much of each bucket's TEXT —
8-word shingles, not vocabulary — was never seen before. This is the
diminishing-returns readout a data-curation pass prices acquisition
against (vocab_growth_by_bucket answers it for TOKENS; token novelty
saturates long before content novelty does, which is why Lee et al.'s
dedup paper measures shingles). A novelty rate falling toward the
boilerplate floor says more of the same source buys nothing.

Keys are xxhash64(shingle) / DuckDB hash(shingle) — grouping parity only
(substring_dedup's discipline). First-seen bucket per shingle is one
map-side-combinable min aggregate; everything downstream is
bucket-count-sized.

Scale stance (100 TB): one shingle pass, one min-groupBy keyed by the
64-bit hash, two bucket-sized aggregates joined on the bucket id. No
window, no pair join, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table_spread
from .substring_dedup import _K, _SH_ARRAY_SPARK

_BUCKET = 50     # docs per ingestion bucket (doc_id order)

_NOVELTY_ORACLE = f"""
WITH w AS (SELECT doc_id, doc_id // {_BUCKET} AS bkt,
                  string_split(text, ' ') ws
           FROM documents),
p AS (SELECT DISTINCT bkt,
             hash(array_to_string(ws[i+1:i+{_K}], ' ')) AS h
      FROM w, unnest(range(greatest(len(ws) - {_K} + 1, 0))) r(i)),
fs AS (SELECT h, min(bkt) AS first_bkt FROM p GROUP BY h),
per AS (SELECT p.bkt,
               cast(count(*) AS bigint) AS distinct_shingles,
               cast(sum(CASE WHEN fs.first_bkt = p.bkt THEN 1 ELSE 0 END)
                    AS bigint) AS novel_shingles
        FROM p JOIN fs USING (h) GROUP BY p.bkt)
SELECT cast(bkt AS bigint) AS bucket,
       distinct_shingles, novel_shingles,
       round(cast(novel_shingles AS double) / distinct_shingles, 6)
         AS novelty_rate
FROM per ORDER BY bucket"""


@register(
    "content_novelty_curve",
    oracle=_NOVELTY_ORACLE,
    tags=("text", "dedup", "curation", "llm-pipeline"),
)
def content_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, distinct_shingles, novel_shingles, novelty_rate) per
    {_BUCKET}-doc ingestion bucket (module docstring)."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    p = (d.select(F.expr(f"doc_id div {_BUCKET}").alias("bkt"),
                  F.split("text", " ").alias("ws"))
         .select("bkt", F.explode_outer(F.expr(_SH_ARRAY_SPARK))
                 .alias("sh"))
         .filter(F.col("sh").isNotNull())
         .select("bkt", F.xxhash64("sh").alias("h"))
         .distinct())
    fs = p.groupBy("h").agg(F.min("bkt").alias("first_bkt"))
    per = (p.join(fs, "h")
           .groupBy("bkt")
           .agg(F.count(F.lit(1)).cast("long").alias("distinct_shingles"),
                F.sum(F.when(F.col("first_bkt") == F.col("bkt"), 1)
                      .otherwise(0)).cast("long").alias("novel_shingles")))
    return (per.select(F.col("bkt").cast("long").alias("bucket"),
                       "distinct_shingles", "novel_shingles",
                       F.round(F.col("novel_shingles").cast("double")
                               / F.col("distinct_shingles"), 6)
                       .alias("novelty_rate"))
            .orderBy("bucket"))
