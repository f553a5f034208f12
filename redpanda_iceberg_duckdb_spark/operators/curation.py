"""Corpus-curation operators: the decisions a training-data pipeline makes
AFTER measuring (mixture allocation, filter funnels, token-budget selection,
deterministic sampling, and an end-to-end dedup+filter pipeline rollup).

Scale notes (100 TB stance):
- Every operator reduces the corpus with ONE hash aggregate (map-side
  combinable) before any window/join runs; the windows then operate on
  dimension-sized frames (|sources|, |fingerprints|), never on raw rows.
- `mixture_allocation` is integer-exact largest-remainder apportionment —
  no floating-point quotas, so the result is bit-identical across engines
  and across partitionings (the property you need for reproducible data
  mixes between pipeline runs).
- `hash_sample_per_source` is the distributed replacement for reservoir
  sampling: rank on a content-independent hash, keep k per group. Spark
  plans the rank filter as WindowGroupLimit (partial top-k on the map
  side), so no group ever materializes fully.
- Rule predicates are integer inequalities (``2*nd < n`` instead of
  ``nd/n < 0.5``) — exact in both engines, no epsilon.

Reference parity: the reference has no curation surface (its queries are
fixed trade aggregates, /root/reference/duckdb/query_and_publish.py:107-122);
this module is additive LLM-pipeline coverage per the build brief, same
fixture contract as operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_BUDGET = 10_000  # docs to allocate across sources in mixture_allocation


@register(
    "mixture_allocation",
    oracle=f"""
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT source, n_docs,
             cast(({_BUDGET} * n_docs) // cast(sum(n_docs) OVER () as bigint)
                  as bigint) AS base,
             cast(({_BUDGET} * n_docs) % cast(sum(n_docs) OVER () as bigint)
                  as bigint) AS rem
      FROM c),
r AS (SELECT source, n_docs, base, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rn,
             {_BUDGET} - cast(sum(base) OVER () as bigint) AS leftover
      FROM t)
SELECT source, n_docs,
       base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS n_alloc
FROM r ORDER BY source""",
    tags=("curation", "sampling"),
)
def mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed sample budget
    across sources, proportional to document counts. All arithmetic is
    64-bit integer — quota = budget*n_docs div total, remainders ranked
    (desc, source asc) to hand out the leftover — so allocations sum to the
    budget EXACTLY and match bit-for-bit across engines and runs. The
    windows run over the per-source aggregate (|sources| rows), so the
    single-partition global window is dimension-sized, never data-sized."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wall = W.partitionBy()  # |sources| rows only — see docstring
    c = (c.withColumn("total", F.sum("n_docs").over(wall))
         .withColumn("base", F.expr(f"({_BUDGET} * n_docs) div total"))
         .withColumn("rem", (F.lit(_BUDGET) * F.col("n_docs")) % F.col("total")))
    c = (c.withColumn("rn", F.row_number().over(
            W.partitionBy().orderBy(F.desc("rem"), "source")))
         .withColumn("leftover", F.lit(_BUDGET) - F.sum("base").over(wall)))
    return (c.select(
                "source", "n_docs",
                (F.col("base") + F.when(F.col("rn") <= F.col("leftover"), 1)
                 .otherwise(0)).alias("n_alloc"))
            .orderBy("source"))


# Shared funnel rule set: first-failing-rule attribution, exact predicates
# (integer inequalities + a categorical language gate — no float thresholds).
_FUNNEL_STAGES = ["1_too_short", "2_too_long", "3_repetitive",
                  "4_non_english", "5_kept"]

_FUNNEL_CASE_DUCK = """
CASE WHEN len(string_split(text, ' ')) < 20 THEN '1_too_short'
     WHEN len(string_split(text, ' ')) > 80 THEN '2_too_long'
     WHEN 2 * len(list_distinct(string_split(text, ' ')))
          < len(string_split(text, ' ')) THEN '3_repetitive'
     WHEN lang <> 'en' THEN '4_non_english'
     ELSE '5_kept' END
"""


def _funnel_stage_spark() -> F.Column:
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return (F.when(n < 20, "1_too_short")
            .when(n > 80, "2_too_long")
            .when(2 * nd < n, "3_repetitive")
            .when(F.col("lang") != "en", "4_non_english")
            .otherwise("5_kept"))


@register(
    "quality_filter_funnel",
    oracle=f"""
WITH s AS (SELECT {_FUNNEL_CASE_DUCK} AS stage FROM documents),
c AS (SELECT stage, count(*) AS n_docs FROM s GROUP BY stage)
SELECT stage, n_docs,
       round(100.0 * n_docs / cast(sum(n_docs) OVER () as bigint), 6) AS pct
FROM c ORDER BY stage""",
    tags=("curation", "filter"),
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter funnel with first-failing-rule attribution: every document is
    charged to exactly ONE stage (too short -> too long -> repetitive ->
    non-English -> kept, in rule order), so stage counts sum to the corpus
    and the funnel is auditable. Predicates are integer inequalities
    (2*nd < n) plus a categorical language gate — no float thresholds to
    drift cross-engine. One scan, one tiny aggregate; the pct window runs
    over |stages| rows."""
    d = load_table(spark, sf_dir, "documents")
    c = (d.select(_funnel_stage_spark().alias("stage"))
         .groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs")))
    return (c.select(
                "stage", "n_docs",
                F.round(100.0 * F.col("n_docs")
                        / F.sum("n_docs").over(W.partitionBy()), 6)
                .alias("pct"))
            .orderBy("stage"))


_QUALITY_DUCK = """
round(0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)
    + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' ')))
    + 0.2 * (1.0 - least(len(regexp_extract_all(text, '[^a-z0-9 ]'))
                         * 1.0 / length(text), 1.0)), 6)
"""


def _quality_spark() -> F.Column:
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    punct = F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
    return F.round(
        0.4 * F.least(n / F.lit(100.0), F.lit(1.0))
        + 0.4 * ttr
        + 0.2 * (1.0 - F.least(punct / F.length("text"), F.lit(1.0))), 6)


@register(
    "token_budget_topp",
    oracle=f"""
WITH q AS (SELECT source, doc_id,
                  len(string_split(text, ' ')) AS n_tok,
                  {_QUALITY_DUCK} AS quality
           FROM documents),
c AS (SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source
                              ORDER BY quality DESC, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tok,
             sum(n_tok) OVER (PARTITION BY source) AS tot_tok
      FROM q)
SELECT source,
       count(*) FILTER (WHERE 5 * (cum_tok - n_tok) < 4 * tot_tok) AS n_kept,
       count(*) AS n_docs,
       cast(sum(n_tok) FILTER (WHERE 5 * (cum_tok - n_tok) < 4 * tot_tok)
            AS bigint) AS tokens_kept,
       cast(min(tot_tok) AS bigint) AS tot_tokens
FROM c GROUP BY source ORDER BY source""",
    tags=("curation", "window", "topp"),
)
def token_budget_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) selection under a token budget: per source, rank
    documents by quality (desc, doc_id tie-break) and keep the smallest
    prefix holding >= 80% of the source's tokens. The keep test is the
    integer inequality 5*(cum - own) < 4*total — a row is kept iff the
    budget wasn't already met BEFORE it — so boundary docs are handled
    identically in both engines. Quality doubles are bit-equal cross-engine
    (same integer inputs, same IEEE ops — proven by quality_score's green
    hash row). The cumulative window runs per source over doc-count rows;
    at 100 TB you'd pre-bucket by source so the sort is partition-local."""
    d = load_table(spark, sf_dir, "documents")
    q = d.select("source", "doc_id",
                 F.size(F.split(F.col("text"), " ")).alias("n_tok"),
                 _quality_spark().alias("quality"))
    wcum = (W.partitionBy("source").orderBy(F.desc("quality"), "doc_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    c = (q.withColumn("cum_tok", F.sum("n_tok").over(wcum))
         .withColumn("tot_tok", F.sum("n_tok").over(W.partitionBy("source"))))
    keep = 5 * (F.col("cum_tok") - F.col("n_tok")) < 4 * F.col("tot_tok")
    return (c.groupBy("source")
            .agg(F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(keep, F.col("n_tok"))).alias("tokens_kept"),
                 F.min("tot_tok").alias("tot_tokens"))
            .orderBy("source"))


@register(
    "hash_sample_per_source",
    oracle="""
WITH r AS (SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY md5(cast(doc_id as varchar)),
                                              doc_id) AS rn
           FROM documents)
SELECT source, doc_id, rn AS sample_rank
FROM r WHERE rn <= 5 ORDER BY source, sample_rank""",
    tags=("curation", "sampling", "window"),
)
def hash_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: rank every document by
    md5(doc_id) — a content-independent, uniformly-distributed sort key —
    and keep the first 5 per source. This is the distributed replacement
    for reservoir sampling: same marginal uniformity, but reproducible
    across runs/engines and plannable as a partial top-k (Spark rewrites
    the rn <= k filter to WindowGroupLimit, so map tasks keep only k
    candidates each and no group ever materializes)."""
    d = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (d.select("source", "doc_id", rn.alias("rn"))
            .filter(F.col("rn") <= 5)
            .select("source", "doc_id", F.col("rn").alias("sample_rank"))
            .orderBy("source", "sample_rank"))


@register(
    "curation_pipeline_stats",
    bench=True,
    oracle=rf"""
WITH fp AS (
  SELECT doc_id, source, text, lang,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
  FROM documents),
surv AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp),
kept AS (
  SELECT f.source, len(string_split(f.text, ' ')) AS n_tok,
         CASE WHEN len(string_split(f.text, ' ')) < 20 THEN '1_too_short'
              WHEN len(string_split(f.text, ' ')) > 80 THEN '2_too_long'
              WHEN 2 * len(list_distinct(string_split(f.text, ' ')))
                   < len(string_split(f.text, ' ')) THEN '3_repetitive'
              WHEN f.lang <> 'en' THEN '4_non_english'
              ELSE '5_kept' END AS stage
  FROM fp f JOIN surv s ON f.doc_id = s.keep_id)
SELECT source,
       count(*) AS n_after_dedup,
       count(*) FILTER (WHERE stage = '5_kept') AS n_final,
       cast(sum(n_tok) FILTER (WHERE stage = '5_kept') AS bigint)
           AS tokens_final
FROM kept GROUP BY source ORDER BY source""",
    tags=("curation", "dedup", "pipeline"),
)
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation rollup: exact dedup (canonical-whitespace md5
    fingerprint, min-doc_id survivor — same key as dedup_exact_survivors)
    THEN the quality funnel, reported per source. This is the query a
    pipeline runs to sign off a training mix: how much survived dedup, how
    much survived filtering, and how many tokens remain. Survivors come
    from ONE window rank over the fingerprint key (rn = 1 in doc_id order —
    Spark plans a WindowGroupLimit partial top-1 before the exchange), NOT
    a min-aggregate joined back, so the corpus crosses the wire once; the
    funnel CASE is scan-level and the final rollup is |sources|-sized."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    fp = d.select("doc_id", "source", "text", "lang", F.md5(norm).alias("fp"))
    rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
    kept = (fp.withColumn("rn", rn).filter(F.col("rn") == 1)
            .select("source",
                    F.size(F.split(F.col("text"), " ")).alias("n_tok"),
                    _funnel_stage_spark().alias("stage")))
    final = F.col("stage") == "5_kept"
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_after_dedup"),
                 F.sum(F.when(final, 1).otherwise(0)).alias("n_final"),
                 F.sum(F.when(final, F.col("n_tok"))).alias("tokens_final"))
            .orderBy("source"))


# mixture_resample budget: below the sf0.01 corpus size (500 docs) so the
# driver-gate run actually drops documents; at sf0.001 (50 docs) every doc
# is kept — allocation capped by availability, which is the correct
# semantics when a stratum can't fill its quota.
_RESAMPLE_BUDGET = 200


@register(
    "mixture_resample",
    oracle=f"""
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT source, n_docs,
             cast(({_RESAMPLE_BUDGET} * n_docs)
                  // cast(sum(n_docs) OVER () as bigint) as bigint) AS base,
             cast(({_RESAMPLE_BUDGET} * n_docs)
                  % cast(sum(n_docs) OVER () as bigint) as bigint) AS rem
      FROM c),
r AS (SELECT source, base, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rn,
             {_RESAMPLE_BUDGET} - cast(sum(base) OVER () as bigint)
                 AS leftover
      FROM t),
alloc AS (SELECT source,
                 base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS n_alloc
          FROM r),
ranked AS (SELECT source, doc_id,
                  cast(row_number() OVER (
                      PARTITION BY source
                      ORDER BY {md5_mod_duck("cast(doc_id as varchar)")},
                               doc_id) AS int) AS sample_rank
           FROM documents)
SELECT ranked.source, doc_id, sample_rank
FROM ranked JOIN alloc ON alloc.source = ranked.source
WHERE sample_rank <= n_alloc
ORDER BY ranked.source, sample_rank""",
    tags=("curation", "sampling"),
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize mixture_allocation's quotas: per source, keep the
    n_alloc documents with the smallest content-stable hash (ties broken by
    doc_id) — the deterministic, retry-stable realization of a target data
    mix, reproducible across engines and partitionings. Keeping hash-rank
    minima (not 'first n_alloc rows') makes the sample independent of scan
    order AND monotone under corpus growth: a doc only leaves the sample
    when a smaller-hash doc arrives in its stratum.

    Scale note: the rank filter compares against a per-group COLUMN quota,
    so Spark cannot plan WindowGroupLimit; at 100 TB, pre-filter each
    stratum on hash < (n_alloc / n_docs scaled threshold + slack) before
    ranking to cap the window input — same result, bounded state."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wall = W.partitionBy()
    c = (c.withColumn("total", F.sum("n_docs").over(wall))
         .withColumn("base",
                     F.expr(f"({_RESAMPLE_BUDGET} * n_docs) div total"))
         .withColumn("rem",
                     (F.lit(_RESAMPLE_BUDGET) * F.col("n_docs"))
                     % F.col("total")))
    alloc = (c.withColumn("rn", F.row_number().over(
                W.partitionBy().orderBy(F.desc("rem"), "source")))
             .withColumn("leftover",
                         F.lit(_RESAMPLE_BUDGET) - F.sum("base").over(wall))
             .select("source",
                     (F.col("base")
                      + F.when(F.col("rn") <= F.col("leftover"), 1)
                      .otherwise(0)).alias("n_alloc")))
    ranked = d.select(
        "source", "doc_id",
        F.row_number().over(
            W.partitionBy("source").orderBy(
                F.expr(md5_mod_spark("cast(doc_id as string)")), "doc_id"))
        .cast("int").alias("sample_rank"))
    return (ranked.join(alloc, "source")
            .filter(F.col("sample_rank") <= F.col("n_alloc"))
            .select("source", "doc_id", "sample_rank")
            .orderBy("source", "sample_rank"))
