"""Positional profile of duplicated text: WHERE inside documents does
shared material sit? Substring dedup (substring_dedup.py) finds and cuts
verbatim spans; this query answers the layout question a pipeline asks
first — headers (decile 0), footers (decile 9), or body-wide syndication
— by histogramming duplicated-shingle occurrences over within-document
position deciles. A head/tail-heavy profile says "strip boilerplate
templates"; a flat profile says "doc-level dedup, the text is syndicated
everywhere".

Keys are xxhash64(shingle) / DuckDB hash(shingle) — grouping parity, not
value parity (substring_dedup's round-13 discipline). Decile = (10*pos)
div n_positions on integers, identical in both engines.

Scale stance (100 TB): the shingle pass and the duplicated-flag groupBy
are substring_dedup's (linear, hash-keyed); the profile adds one
broadcast-size join back and a 10-bucket aggregate. No window, no pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table_spread
from .substring_dedup import _K, _SH_ARRAY_SPARK

_POS_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
p AS (SELECT doc_id, i AS pos,
             greatest(len(ws) - {_K} + 1, 1) AS np,
             hash(array_to_string(ws[i+1:i+{_K}], ' ')) AS h
      FROM w, unnest(range(greatest(len(ws) - {_K} + 1, 0))) r(i)),
dup AS (SELECT h FROM p GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
d AS (SELECT (10 * pos) // np AS decile FROM p JOIN dup USING (h)),
tot AS (SELECT cast(count(*) AS bigint) AS n FROM d)
SELECT cast(decile AS int) AS decile,
       cast(count(*) AS bigint) AS n_dup_positions,
       round(cast(count(*) AS double) / (SELECT n FROM tot), 6) AS share
FROM d GROUP BY decile ORDER BY decile"""


@register(
    "span_position_profile",
    oracle=_POS_ORACLE,
    tags=("dedup", "substring", "boilerplate", "llm-pipeline"),
)
def span_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of duplicated-shingle occurrences over within-document
    position deciles (module docstring): (decile, n_dup_positions,
    share)."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    p = (d.select("doc_id", F.split("text", " ").alias("ws"))
         .select("doc_id",
                 F.greatest(F.size("ws") - (_K - 1), F.lit(1)).alias("np"),
                 F.posexplode_outer(F.expr(_SH_ARRAY_SPARK))
                  .alias("pos", "sh"))
         .filter(F.col("sh").isNotNull())
         .select("doc_id", "pos", "np", F.xxhash64("sh").alias("h")))
    dup = (p.select("h", "doc_id").distinct()
           .groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
           .filter(F.col("nd") >= 2).select("h"))
    dd = (p.join(dup, "h")
          .select(F.expr("(10 * pos) div np").cast("int").alias("decile")))
    tot = dd.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (dd.groupBy("decile")
            .agg(F.count(F.lit(1)).cast("long").alias("n_dup_positions"))
            .crossJoin(F.broadcast(tot))
            .select("decile", "n_dup_positions",
                    F.round(F.col("n_dup_positions").cast("double")
                            / F.col("n"), 6).alias("share"))
            .orderBy("decile"))
