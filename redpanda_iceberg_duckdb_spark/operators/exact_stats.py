"""Exact order statistics, distribution summaries, and reshaping ops added
in round 8: rank-based exact percentiles via the value-histogram algorithm,
Shannon token entropy per corpus source, deterministic ordered string
aggregation, and the DataFrame pivot API (all with DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

# ------------------------------------------------- exact percentiles

_PCTS = (50, 90, 99)


@register(
    "percentile_disc_exact",
    oracle=f"""
WITH h AS (SELECT l_returnflag flag, l_extendedprice v, count(*) c
           FROM lineitem GROUP BY 1, 2),
cum AS (SELECT flag, v,
               sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY flag) AS n
        FROM h)
SELECT flag AS l_returnflag,
       {", ".join(
           f"min(CASE WHEN cum >= cast(ceil(n * {p} / 100.0) AS bigint) "
           f"THEN v END) AS p{p}" for p in _PCTS)},
       cast(max(n) AS bigint) AS n_rows
FROM cum GROUP BY flag ORDER BY flag""",
    tags=("statistics", "percentile", "exact"),
)
def percentile_disc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99 of l_extendedprice per
    return flag): the value at rank ceil(p·n) — a VALUE FROM THE DATA,
    never interpolated, so both engines agree bitwise.

    Scale stance: the naive plan sorts each partition's full row set
    (per-group global sort — three giant skewed groups at 100 TB). This
    uses the value-histogram decomposition instead: groupBy (flag, value)
    counts first — map-side combinable, collapsing N rows to D distinct
    values — then the cumulative rank runs over the DISTINCT-value table
    only. Exactness is unaffected (rank of a value = cumulative count);
    the expensive sort shrinks from O(N) rows to O(D). approx_percentile
    is the sketch alternative when even D is too big; this is the exact
    path a data contract audits against."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (li.groupBy(F.col("l_returnflag").alias("flag"),
                    F.col("l_extendedprice").alias("v"))
         .agg(F.count(F.lit(1)).alias("c")))
    cum = (h.withColumn("cum", F.sum("c").over(
               W.partitionBy("flag").orderBy("v")))
           .withColumn("n", F.sum("c").over(W.partitionBy("flag"))))
    aggs = [F.min(F.when(
                F.col("cum") >= F.ceil(F.col("n") * p / 100.0)
                .cast("bigint"), F.col("v"))).alias(f"p{p}")
            for p in _PCTS]
    return (cum.groupBy("flag")
            .agg(*aggs, F.max("n").cast("bigint").alias("n_rows"))
            .select(F.col("flag").alias("l_returnflag"),
                    *[f"p{p}" for p in _PCTS], "n_rows")
            .orderBy("l_returnflag"))


# ------------------------------------------------- token entropy

@register(
    "entropy_by_source",
    oracle="""
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
             FROM documents),
cnt AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok)
SELECT source,
       cast(sum(c) AS bigint) AS n_tokens,
       cast(count(*) AS bigint) AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy_nats
FROM cnt GROUP BY source ORDER BY source""",
    tags=("text", "statistics", "quality"),
)
def entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the unigram distribution per document
    source — the corpus-diversity signal that separates natural text
    (high entropy) from templated/boilerplate slices (low), read next to
    zipf_fit_by_source when deciding what a training mix over-samples.
    Uses the count-decomposed identity H = ln N − (Σ c·ln c)/N so the
    whole thing is two map-side-combinable aggregates — no per-row
    probabilities, no second pass. Scale: shuffle 1 keys (source, token)
    with partial combine; shuffle 2 collapses to one row per source."""
    d = load_table(spark, sf_dir, "documents")
    cnt = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
           .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c")))
    return (cnt.groupBy("source")
            .agg(F.sum("c").cast("bigint").alias("n_tokens"),
                 F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                 F.round(F.log(F.sum("c"))
                         - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6)
                 .alias("entropy_nats"))
            .orderBy("source"))


# ------------------------------------------------- ordered string agg

@register(
    "ordered_string_agg_parts",
    oracle="""
WITH d AS (SELECT DISTINCT p_brand, p_type FROM part)
SELECT p_brand,
       string_agg(p_type, '|' ORDER BY p_type) AS types,
       cast(count(*) AS bigint) AS n_types
FROM d GROUP BY p_brand ORDER BY p_brand""",
    tags=("aggregation", "string"),
)
def ordered_string_agg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered string aggregation (DuckDB/Postgres
    string_agg(... ORDER BY ...) parity): Spark's collect_list is
    order-NONdeterministic under parallel merge, so the stable spelling is
    array_join(array_sort(collect_list(...))) — sort at the group level,
    after the shuffle, where each group's list is already local. Aggregated
    over the DISTINCT (brand, type) pairs so group payloads are bounded by
    the type domain (~150), not row count — the cap a 100 TB run needs
    before any collect_list."""
    p = load_table(spark, sf_dir, "part")
    d = p.select("p_brand", "p_type").distinct()
    return (d.groupBy("p_brand")
            .agg(F.array_join(F.array_sort(F.collect_list("p_type")),
                              "|").alias("types"),
                 F.count(F.lit(1)).cast("bigint").alias("n_types"))
            .orderBy("p_brand"))


# ------------------------------------------------- pivot

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_event_counts",
    oracle=f"""
SELECT cast(ts AS date) AS day,
       {", ".join(
           f"cast(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
           f"AS bigint) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY 1 ORDER BY day""",
    tags=("reshape", "pivot"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide reshape via the DataFrame pivot API: daily event
    counts, one column per event type. The value list is EXPLICIT
    (df.groupBy().pivot(col, values)) — with an inferred list Spark first
    runs a blocking distinct scan AND the output schema becomes
    data-dependent, both wrong at 100 TB; pinning the domain keeps the
    plan a single shuffle with map-side partial counts, exactly a manual
    CASE fan-out (which is what the oracle spells)."""
    e = load_table(spark, sf_dir, "events")
    piv = (e.select(F.col("ts").cast("date").alias("day"), "event_type")
           .groupBy("day")
           .pivot("event_type", list(_EVENT_TYPES))
           .count())
    return (piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
          for t in _EVENT_TYPES])
        .orderBy("day"))
