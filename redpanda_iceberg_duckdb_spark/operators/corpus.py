"""Corpus-level text operators: PII-style redaction, n-gram frequency
tables, and document-length histograms — the remaining bookkeeping ops of a
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# A "PII-ish" pattern over the synthetic corpus: digit runs and the word
# 'key' stand in for account numbers / sensitive tokens. The operator shape
# (regex redact + audit counts) is what matters; swap patterns in production.
_PII_RE = r"[0-9]+|key"


@register(
    "pii_redaction_audit",
    oracle=rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_RE}')) AS n_redactions,
       md5(regexp_replace(text, '{_PII_RE}', '[REDACTED]', 'g')) AS redacted_md5,
       length(regexp_replace(text, '{_PII_RE}', '[REDACTED]', 'g'))
           AS redacted_len
FROM documents
ORDER BY doc_id""",
    tags=("text", "redaction"),
)
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass + audit trail: per-doc redaction count and a digest of
    the redacted text (the digest is what downstream verification pipelines
    store — never the raw spans). Pure regexp, JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(F.col("text"), _PII_RE, "[REDACTED]")
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{_PII_RE}', 0)"))
        .alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).alias("redacted_len"),
    ).orderBy("doc_id")


@register(
    "bigram_frequencies",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
bg AS (SELECT ws[i+1] || ' ' || ws[i+2] AS bigram
       FROM w, unnest(range(greatest(len(ws) - 1, 0))) r(i)),
counts AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
SELECT bigram, n,
       row_number() OVER (ORDER BY n DESC, bigram) AS rnk
FROM counts
ORDER BY rnk
LIMIT 25""",
    tags=("text", "ngram"),
)
def bigram_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 word bigrams: explode -> count -> top-k. The
    aggregate is partial before the shuffle; the final top-k is a single
    TakeOrdered over group counts (vocabulary-sized, not corpus-sized)."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    bg = (d.select(F.split("text", " ").alias("ws"))
          .select(F.explode_outer(F.expr(
              "case when size(ws) >= 2 then transform(sequence(0, size(ws)-2),"
              " i -> concat_ws(' ', ws[i], ws[i+1])) else array() end"))
              .alias("bigram"))
          # outer + filter: keeps the inferred Generate predicate (which
          # would re-run the transform at the scan) out of the plan
          .filter(F.col("bigram").isNotNull()))
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = W.orderBy(F.desc("n"), F.asc("bigram"))
    return (counts.select("bigram", "n", F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= 25).orderBy("rnk"))


@register(
    "doc_length_histogram",
    oracle="""
SELECT cast(CASE WHEN n_chars >= 500 THEN 11 ELSE n_chars // 50 + 1 END AS int)
           AS bucket,
       count(*) AS n_docs,
       cast(min(n_chars) AS bigint) AS min_chars,
       cast(max(n_chars) AS bigint) AS max_chars
FROM documents
GROUP BY bucket
ORDER BY bucket""",
    tags=("text", "histogram"),
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram: 10 fixed-width 50-char buckets + overflow.
    Pure integer bucketing (width_bucket semantics, but exact integer
    division so both engines agree by construction)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.when(F.col("n_chars") >= 500, 11)
              .otherwise(F.expr("n_chars div 50") + 1)).cast("int")
    return (d.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"))
            .orderBy("bucket"))


@register(
    "k_anonymity_audit",
    oracle="""
WITH qi AS (
  SELECT event_type,
         cast(date_trunc('day', ts) AS timestamp) AS day,
         cast(floor(value / 100.0) AS int) AS value_band,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3)
SELECT event_type,
       count(*) AS n_groups,
       cast(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS bigint)
           AS n_small_groups,
       cast(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS bigint)
           AS n_rows_at_risk,
       round(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 1.0 / sum(n), 6)
           AS at_risk_share
FROM qi GROUP BY event_type ORDER BY event_type""",
    tags=("corpus", "privacy", "quality"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen (k=5) over the quasi-identifier tuple
    (event_type, day, value band): how many QI groups are small enough to
    re-identify someone, and what share of rows sits in them — the release
    gate a privacy pipeline runs before publishing "anonymized" analytics.
    Two cheap aggregates (QI rollup, then per-type summary); value bands are
    integer-floored at an exact power-of-ten edge so banding is
    engine-independent."""
    e = load_table(spark, sf_dir, "events")
    qi = (e.groupBy("event_type",
                    F.date_trunc("day", "ts").alias("day"),
                    F.floor(F.col("value") / 100.0).cast("int")
                    .alias("value_band"))
          .agg(F.count(F.lit(1)).alias("n")))
    small = F.when(F.col("n") < 5, F.col("n")).otherwise(0)
    return (qi.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
                  .alias("n_small_groups"),
                 F.sum(small).alias("n_rows_at_risk"),
                 F.round(F.sum(small) / F.sum("n"), 6)
                  .alias("at_risk_share"))
            .orderBy("event_type"))


@register(
    "l_diversity_audit",
    oracle="""
WITH qi AS (
  SELECT event_type,
         cast(date_trunc('day', ts) AS timestamp) AS day,
         cast(floor(value / 100.0) AS int) AS value_band,
         count(*) AS n,
         count(DISTINCT user_id) AS l_div
  FROM events GROUP BY 1, 2, 3)
SELECT event_type,
       count(*) AS n_groups,
       cast(sum(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS bigint)
           AS n_low_diversity,
       cast(sum(CASE WHEN l_div < 3 THEN n ELSE 0 END) AS bigint)
           AS n_rows_exposed,
       min(CASE WHEN l_div < 3 THEN l_div END) AS worst_l
FROM qi GROUP BY event_type ORDER BY event_type""",
    tags=("corpus", "privacy", "quality"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity screen (l=3) over the same quasi-identifier tuple as
    k_anonymity_audit: a QI group is exposed when its SENSITIVE attribute
    (here user_id) takes fewer than 3 distinct values — k-anonymity's known
    blind spot (a large group is still a leak if everyone in it shares the
    sensitive value). Same two-aggregate shape as the k-anon audit; the
    distinct count rides the existing QI shuffle, so the added cost at
    100 TB is one partial-distinct in the same exchange."""
    e = load_table(spark, sf_dir, "events")
    qi = (e.groupBy("event_type",
                    F.date_trunc("day", "ts").alias("day"),
                    F.floor(F.col("value") / 100.0).cast("int")
                    .alias("value_band"))
          .agg(F.count(F.lit(1)).alias("n"),
               F.countDistinct("user_id").alias("l_div")))
    low = F.col("l_div") < 3
    return (qi.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_groups"),
                 F.sum(F.when(low, 1).otherwise(0)).alias("n_low_diversity"),
                 F.sum(F.when(low, F.col("n")).otherwise(0))
                  .alias("n_rows_exposed"),
                 F.min(F.when(low, F.col("l_div"))).alias("worst_l"))
            .orderBy("event_type"))
