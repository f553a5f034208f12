"""Shared-prefix boilerplate detection: documents that OPEN with the same
K words — the crawl-pipeline signal for templated headers (cookie
banners, licence preambles, forum headers) that doc-level near-dup misses
(bodies differ) and substring dedup finds but cannot attribute to the
document HEAD, where a boilerplate-stripping pass actually cuts.

Per source: how many documents share their opening K-gram with at least
one other document (anywhere in the corpus), how many distinct shared
openings, and the largest template family. Grouping keys are 64-bit
hashes, not strings (substring_dedup's round-13 discipline): Spark
shuffles xxhash64(prefix), the DuckDB oracle groups hash(prefix) — the
engines need not agree on hash values, only on the induced grouping.

Scale stance (100 TB): one corpus pass emitting (source, prefix-hash) per
document, one map-side-combinable groupBy on the hash, one broadcast-back
join keyed by the same hash; no window, no pair join — template families
aggregate to one row each before anything fans back out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_K = 6          # opening words that define the template key

_PREFIX_ORACLE = f"""
WITH p AS (SELECT doc_id, source,
                  hash(array_to_string(string_split(text, ' ')[1:{_K}],
                                       ' ')) AS h,
                  len(string_split(text, ' ')) AS nw
           FROM documents),
q AS (SELECT doc_id, source, h FROM p WHERE nw >= {_K}),
g AS (SELECT h, cast(count(*) AS bigint) AS family
      FROM q GROUP BY h HAVING count(*) >= 2),
j AS (SELECT q.source, q.h, g.family FROM q JOIN g USING (h))
SELECT source,
       cast(count(*) AS bigint) AS n_boilerplate_docs,
       cast(count(DISTINCT h) AS bigint) AS n_templates,
       cast(max(family) AS bigint) AS max_family
FROM j GROUP BY source ORDER BY source"""


@register(
    "shared_prefix_boilerplate",
    oracle=_PREFIX_ORACLE,
    tags=("text", "dedup", "boilerplate", "llm-pipeline"),
)
def shared_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-opening statistics (module docstring):
    documents whose first {_K} words are shared corpus-wide, distinct
    template keys, and the largest template family."""
    d = load_table(spark, sf_dir, "documents")
    p = (d.select("doc_id", "source", F.split("text", " ").alias("ws"))
         .filter(F.size("ws") >= _K)
         .select("doc_id", "source",
                 F.xxhash64(F.concat_ws(
                     " ", *[F.col("ws")[i] for i in range(_K)]))
                 .alias("h")))
    g = (p.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("family"))
         .filter(F.col("family") >= 2))
    j = p.join(g, "h")
    return (j.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_boilerplate_docs"),
                 F.count_distinct("h").cast("long").alias("n_templates"),
                 F.max("family").cast("long").alias("max_family"))
            .orderBy("source"))
