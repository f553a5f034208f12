"""Dedup savings report, span edition: what stripping duplicated VERBATIM
spans would buy per source — the ops readout a pipeline owner prices
before scheduling the substring-dedup rewrite (substring_dedup.py finds
the cutlist; this query totals its token mass against each source's
budget). Exact whole-document duplicates barely exist in this corpus
(8 of 5000 docs at sf0.1, zero below — a doc-level savings report would
be verification theater, the round-12 lesson), while shared boilerplate
spans are everywhere, so the span-level price is the one that matters.

Span accounting is substring_dedup's islands-and-gaps verbatim: a run of
L consecutive duplicated K-shingles prices L+K-1 duplicated tokens.
Token budgets are whitespace tokens, the packing/mixture unit. Keys are
xxhash64 / DuckDB hash (grouping parity only).

Scale stance (100 TB): the shingle flag pass and per-doc run windows are
substring_dedup's (linear, hash-keyed, doc-partitioned); this adds one
per-doc aggregate joined back to (doc -> source, tokens) and one
per-source rollup. No pair join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table_spread
from .substring_dedup import _K, _SH_ARRAY_SPARK

_SAVINGS_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') ws
           FROM documents),
p AS (SELECT doc_id, i AS pos,
             hash(array_to_string(ws[i+1:i+{_K}], ' ')) AS h
      FROM w, unnest(range(greatest(len(ws) - {_K} + 1, 0))) r(i)),
dup AS (SELECT h FROM p GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
d AS (SELECT doc_id, pos,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM p JOIN dup USING (h)),
sp AS (SELECT doc_id, cast(count(*) + {_K} - 1 AS bigint) AS span_toks
       FROM d GROUP BY doc_id, pos - rn),
per_doc AS (SELECT doc_id, cast(count(*) AS bigint) AS n_spans,
                   cast(sum(span_toks) AS bigint) AS dup_toks
            FROM sp GROUP BY doc_id)
SELECT w.source,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(CASE WHEN per_doc.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS bigint) AS n_docs_with_spans,
       cast(sum(len(ws)) AS bigint) AS n_tokens,
       cast(coalesce(sum(per_doc.dup_toks), 0) AS bigint) AS n_dup_tokens,
       round(cast(coalesce(sum(per_doc.dup_toks), 0) AS double)
             / sum(len(ws)), 6) AS savings_pct
FROM w LEFT JOIN per_doc ON per_doc.doc_id = w.doc_id
GROUP BY w.source ORDER BY w.source"""


@register(
    "dedup_savings_by_source",
    oracle=_SAVINGS_ORACLE,
    tags=("dedup", "substring", "report", "llm-pipeline"),
)
def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_docs_with_spans, n_tokens, n_dup_tokens,
    savings_pct): the token budget a duplicated-span strip recovers, per
    source (module docstring)."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    base = docs.select("doc_id", "source",
                       F.split("text", " ").alias("ws"))
    p = (base.select("doc_id",
                     F.posexplode_outer(F.expr(_SH_ARRAY_SPARK))
                      .alias("pos", "sh"))
         .filter(F.col("sh").isNotNull())
         .select("doc_id", "pos", F.xxhash64("sh").alias("h")))
    dup = (p.select("h", "doc_id").distinct()
           .groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
           .filter(F.col("nd") >= 2).select("h"))
    dpos = p.join(dup, "h").select("doc_id", "pos")
    wd = W.partitionBy("doc_id").orderBy("pos")
    per_doc = (dpos.withColumn("rn", F.row_number().over(wd))
               .withColumn("grp", F.col("pos") - F.col("rn"))
               .groupBy("doc_id", "grp")
               .agg((F.count(F.lit(1)) + F.lit(_K - 1)).alias("span_toks"))
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                    F.sum("span_toks").cast("long").alias("dup_toks")))
    j = (base.select("doc_id", "source",
                     F.size("ws").cast("long").alias("toks"))
         .join(per_doc, "doc_id", "left_outer"))
    return (j.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.count("dup_toks").cast("long")
                 .alias("n_docs_with_spans"),
                 F.sum("toks").cast("long").alias("n_tokens"),
                 F.coalesce(F.sum("dup_toks"), F.lit(0)).cast("long")
                 .alias("n_dup_tokens"))
            .select("source", "n_docs", "n_docs_with_spans", "n_tokens",
                    "n_dup_tokens",
                    F.round(F.col("n_dup_tokens").cast("double")
                            / F.col("n_tokens"), 6).alias("savings_pct"))
            .orderBy("source"))
