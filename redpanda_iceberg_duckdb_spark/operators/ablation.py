"""Leave-one-source-out ablation — data valuation by sufficient
statistics: what happens to a corpus-level quality metric if an entire
source is dropped?

The naive form re-aggregates the corpus once per source (k full scans);
the sufficient-stats form is ONE scan: per-source (sum, count) partials
combine algebraically into every leave-one-out mean,

    loo_mean(s) = (S_total - S_s) / (N_total - N_s)

so k ablations cost the same as one. This is the curation loop's "which
source is dragging quality" table, the additive-metric special case of
Shapley-style data valuation (Ghorbani & Zou, ICML 2019 motivate the
question; for additive metrics the marginal contribution is exact and
closed-form).

Scale stance: one map-side-combinable hash aggregate to #sources rows,
then a broadcast of the single global row. Token counts are integers, so
the sums are exact in both engines and the only floats are final
quotients (rounded) — no summation-order slack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# Whitespace-token count; matches DuckDB length(string_split_regex).
_TOKENS_SPARK = r"size(split(trim(text), '\\s+'))"
_TOKENS_DUCK = r"length(string_split_regex(trim(text), '\s+'))"


def _oracle() -> str:
    return f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         sum({_TOKENS_DUCK}) AS tok
  FROM documents GROUP BY source),
total AS (SELECT sum(n_docs) AS n_all, sum(tok) AS tok_all
          FROM per_source)
SELECT p.source,
       cast(p.n_docs AS bigint) AS n_docs,
       round(cast(p.tok AS double) / p.n_docs, 6) AS source_mean_tokens,
       round(cast(t.tok_all AS double) / t.n_all, 6) AS global_mean_tokens,
       round(cast(t.tok_all - p.tok AS double) / (t.n_all - p.n_docs), 6)
         AS loo_mean_tokens,
       round(cast(t.tok_all - p.tok AS double) / (t.n_all - p.n_docs)
             - cast(t.tok_all AS double) / t.n_all, 6) AS delta_if_dropped
FROM per_source p, total t
ORDER BY p.source"""


@register(
    "loo_source_ablation",
    oracle=_oracle(),
    tags=("curation", "ablation", "scale-pattern"),
)
def loo_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: its own mean tokens/doc, the global mean, the
    leave-that-source-out mean, and the delta a drop would cause —
    positive delta means the source drags the metric down. All k
    ablations from one aggregate; integer sums keep both engines
    bit-aligned before the final rounded quotients."""
    per_source = (load_table(spark, sf_dir, "documents")
                  .groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum(F.expr(_TOKENS_SPARK)).alias("tok")))
    total = per_source.agg(F.sum("n_docs").alias("n_all"),
                           F.sum("tok").alias("tok_all"))
    loo = (F.col("tok_all") - F.col("tok")).cast("double") \
        / (F.col("n_all") - F.col("n_docs"))
    glob = F.col("tok_all").cast("double") / F.col("n_all")
    return (per_source.crossJoin(F.broadcast(total))
            .select("source",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.round(F.col("tok").cast("double") / F.col("n_docs"), 6)
                    .alias("source_mean_tokens"),
                    F.round(glob, 6).alias("global_mean_tokens"),
                    F.round(loo, 6).alias("loo_mean_tokens"),
                    F.round(loo - glob, 6).alias("delta_if_dropped"))
            .orderBy("source"))
