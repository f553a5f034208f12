"""Training-data pipeline operators: stratified sampling, sequence packing,
and Z-order (Morton) layout keys — the data-curation steps between a raw
corpus and a training run, each expressed as pure map-side or single-shuffle
DataFrame plans.

Scale design (100 TB stance):
- Stratified sampling is a map-side filter on a deterministic content hash —
  no global state, no rand() (retried tasks must sample identically), one
  aggregate to report achieved rates.
- Sequence packing windows are PARTITIONED (per source shard): a global
  first-fit pack would serialize on one partition, so the pack runs per
  shard exactly as a multi-worker tokenizer pipeline does in production.
- Morton keys are per-row bit arithmetic (map-side); the payoff is at write
  time — sorting by zkey before writing gives files tight min/max ranges on
  BOTH interleaved dimensions, so scans filtered on either prune files
  (demonstrated in tests/test_scale_techniques.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

# Per-source sampling rates (percent): high-quality strata keep more.
# Buckets by source suffix number: src0-4 -> 80%, src5-9 -> 50%, rest 20%.
_RATE_SPARK = (
    "CASE WHEN cast(substr(source, 4) as int) < 5 THEN 80 "
    "WHEN cast(substr(source, 4) as int) < 10 THEN 50 ELSE 20 END"
)
_RATE_DUCK = _RATE_SPARK  # same ANSI expression is valid in DuckDB


@register(
    "stratified_sample_by_source",
    oracle=f"""
WITH rated AS (
  SELECT source, {_RATE_DUCK} AS rate_pct,
         {md5_mod_duck("cast(doc_id as varchar)", 100)} AS bucket
  FROM documents)
SELECT source, rate_pct,
       count(*) AS n_total,
       count(*) FILTER (bucket < rate_pct) AS n_sampled,
       round(100.0 * count(*) FILTER (bucket < rate_pct) / count(*), 2)
         AS achieved_pct
FROM rated GROUP BY source, rate_pct
ORDER BY source""",
    bench=True,
    tags=("sampling", "pipeline"),
)
def stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each stratum (source) keeps a
    configured percentage, membership decided by a content-stable md5 hash
    of the key — reproducible across runs, engines, AND retried tasks
    (rand()-based sampling is not). Reports per-stratum achieved rates; the
    sampled corpus itself is the same filter without the aggregate."""
    d = load_table(spark, sf_dir, "documents")
    rated = d.select(
        "source",
        F.expr(_RATE_SPARK).alias("rate_pct"),
        F.expr(md5_mod_spark("cast(doc_id as string)", 100)).alias("bucket"))
    hit = F.when(F.col("bucket") < F.col("rate_pct"), 1).otherwise(0)
    return (rated.groupBy("source", "rate_pct")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(hit).alias("n_sampled"),
                 F.round(F.lit(100.0) * F.sum(hit) / F.count(F.lit(1)), 2)
                 .alias("achieved_pct"))
            .orderBy("source"))


@register(
    "sequence_packing_bins",
    oracle="""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
  FROM documents),
packed AS (
  SELECT source, doc_id, n_tokens,
         cast(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens) / 4096.0)
              as bigint) AS bin_id
  FROM toks)
SELECT source, bin_id,
       count(*) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS bin_tokens
FROM packed GROUP BY source, bin_id
ORDER BY source, bin_id""",
    tags=("packing", "pipeline", "window"),
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training batches: docs are packed in stable
    (doc_id) order into 4096-token bins via an exclusive prefix-sum window —
    bin_id = floor(tokens_before_me / budget). Greedy sequential packing
    (the streaming-tokenizer standard), not bin-perfect FFD — FFD needs a
    global sort by length, which is exactly what doesn't scale. Windows are
    partitioned per source shard, so no single-partition global window
    exists in the plan."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id",
                    F.size(F.split("text", " ")).alias("n_tokens"))
    w = (W.partitionBy("source").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    packed = toks.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 4096.0)
        .cast("long"))
    return (packed.groupBy("source", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("bin_tokens"))
            .orderBy("source", "bin_id"))


# 8-bit x 8-bit Morton interleave: x bits land at even positions, y at odd.
_MORTON_SPARK = (
    "aggregate(transform(sequence(0, 7), i -> "
    "shiftleft(cast((shiftright({x}, i) & 1) as bigint), 2 * i) + "
    "shiftleft(cast((shiftright({y}, i) & 1) as bigint), 2 * i + 1)), "
    "cast(0 as bigint), (acc, v) -> acc + v)"
)
_MORTON_DUCK = (
    "list_sum([((({x} >> i) & 1) << (2*i)) + ((({y} >> i) & 1) << (2*i+1)) "
    "FOR i IN range(8)])"
)


@register(
    "morton_zorder_stats",
    oracle=f"""
WITH keyed AS (
  SELECT event_id,
         cast({_MORTON_DUCK.format(
             x="(user_id & 255)",
             y="(cast(floor(value / 2) as bigint) & 255)")} as bigint) AS zkey
  FROM events)
SELECT zkey >> 10 AS zbucket,
       count(*) AS n,
       min(zkey) AS min_z, max(zkey) AS max_z
FROM keyed GROUP BY zkey >> 10
ORDER BY zbucket""",
    tags=("layout", "zorder"),
)
def morton_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two query dimensions (user
    bucket x value bucket): bit-interleaving makes lexicographic zkey order
    preserve locality in BOTH dimensions, so sorting files by zkey gives
    min/max pruning for filters on either column — multi-dimensional
    clustering without a second copy of the data. This query computes the
    keys (pure map-side) and their bucket histogram; the sort-write +
    file-skipping payoff is asserted in tests/test_scale_techniques.py."""
    e = load_table(spark, sf_dir, "events")
    zkey = F.expr(_MORTON_SPARK.format(
        x="(user_id & 255)",
        y="(cast(floor(value / 2) as bigint) & 255)"))
    keyed = e.select("event_id", zkey.alias("zkey"))
    return (keyed.groupBy(F.shiftright("zkey", 10).alias("zbucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("zkey").alias("min_z"), F.max("zkey").alias("max_z"))
            .orderBy("zbucket"))


def zorder_write(df: DataFrame, out_path: str, x: str, y: str, *,
                 files: int = 16) -> None:
    """Write ``df`` clustered by the Morton key of (x, y): normalize each
    dimension to the full 8-bit domain (otherwise a narrow dimension's bits
    vanish under the wide one's and the interleave degenerates to a 1-D
    sort — Delta's OPTIMIZE ZORDER normalizes via range-ranks for the same
    reason), then repartitionByRange on zkey (contiguous zkey ranges per
    file) + sortWithinPartitions — each parquet file covers a tight
    rectangle in (x, y) space, so min/max stats prune on either dimension.
    The normalization pass collects 4 scalars (dim bounds), never data."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(F.expr(x)), F.max(F.expr(x)),
        F.min(F.expr(y)), F.max(F.expr(y))).collect()[0]

    def scaled(expr: str, lo, hi) -> str:
        span = max(float(hi) - float(lo), 1.0)
        return (f"cast(floor((cast({expr} as double) - {float(lo)}) "
                f"* 255.0 / {span}) as bigint) & 255")

    zkey = F.expr(_MORTON_SPARK.format(
        x=f"({scaled(x, lo_x, hi_x)})", y=f"({scaled(y, lo_y, hi_y)})"))
    (df.withColumn("_zkey", zkey)
     .repartitionByRange(files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(out_path))


@register(
    "chunk_documents_sliding",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, unnest(range(0, len(toks), 12)) AS start, toks FROM t)
SELECT doc_id, cast(start // 12 AS int) AS chunk_idx,
       len(toks[start + 1 : start + 16]) AS n_tokens,
       md5(array_to_string(toks[start + 1 : start + 16], ' ')) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx""",
    tags=("curation", "chunking"),
)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document's token stream into
    overlapping context windows (size 16, stride 12 on this short-doc test
    corpus; production uses e.g. 2048/1536 — the plan is size-independent).
    This is the preprocessing step that turns documents into training
    samples; the md5 per chunk is what a downstream chunk-level dedup keys
    on. Explode fans each doc out to ceil(n_tokens/stride) rows — bounded,
    data-local, no shuffle at all until the final sort; at 100 TB this runs
    entirely map-side."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    c = t.select(
        "doc_id", "toks",
        F.explode(F.expr("sequence(0, size(toks) - 1, 12)")).alias("start"))
    chunk = F.slice("toks", F.col("start") + 1, 16)
    return (c.select(
                "doc_id",
                (F.col("start") / 12).cast("int").alias("chunk_idx"),
                F.size(chunk).alias("n_tokens"),
                F.md5(F.array_join(chunk, " ")).alias("chunk_md5"))
            .orderBy("doc_id", "chunk_idx"))


@register(
    "chunk_dedup_groups",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, unnest(range(0, len(toks), 12)) AS start, toks FROM t),
h AS (SELECT doc_id,
             md5(array_to_string(toks[start + 1 : start + 16], ' '))
                 AS chunk_md5
      FROM c)
SELECT chunk_md5, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs,
       cast(min(doc_id) AS bigint) AS first_doc_id
FROM h GROUP BY chunk_md5 HAVING count(*) > 1
ORDER BY n_occurrences DESC, chunk_md5""",
    tags=("curation", "chunking", "dedup"),
)
def chunk_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplicate groups: the cross-document repeated context
    windows that chunk-level dedup removes before training (document-level
    dedup misses these — boilerplate shared by otherwise-distinct docs).
    One hash aggregate over the chunk fingerprints; survivors keep the
    lowest doc_id. Composes directly with chunk_documents_sliding."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    c = t.select(
        "doc_id",
        F.explode(F.expr("sequence(0, size(toks) - 1, 12)")).alias("start"),
        "toks")
    h = c.select(
        "doc_id",
        F.md5(F.array_join(
            F.slice("toks", F.col("start") + 1, 16), " ")).alias("chunk_md5"))
    return (h.groupBy("chunk_md5")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min("doc_id").alias("first_doc_id"))
            .filter(F.col("n_occurrences") > 1)
            .orderBy(F.desc("n_occurrences"), "chunk_md5"))


# Bin budget for the end-to-end chain: chunks are <=16 tokens here, so a
# 512-token bin yields multiple bins per source at test scale (production
# would use 4096+ with 2048-token chunks — the plan is size-independent).
_E2E_BIN = 512


@register(
    "curation_end_to_end",
    oracle=f"""
WITH sampled AS (
  SELECT doc_id, source, text FROM documents
  WHERE {md5_mod_duck("cast(doc_id as varchar)", 100)} < ({_RATE_DUCK})),
t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM sampled),
c AS (SELECT doc_id, source, unnest(range(0, len(toks), 12)) AS start, toks
      FROM t),
h AS (SELECT doc_id, source, cast(start // 12 AS int) AS chunk_idx,
             len(toks[start + 1 : start + 16]) AS n_tokens,
             md5(array_to_string(toks[start + 1 : start + 16], ' '))
                 AS chunk_md5
      FROM c),
surv AS (SELECT doc_id, source, chunk_idx, n_tokens FROM h
         QUALIFY row_number() OVER (PARTITION BY chunk_md5
                                    ORDER BY doc_id, chunk_idx) = 1),
packed AS (SELECT source, n_tokens,
                  cast(floor((sum(n_tokens) OVER (
                          PARTITION BY source ORDER BY doc_id, chunk_idx
                          ROWS UNBOUNDED PRECEDING) - n_tokens)
                       / {_E2E_BIN}.0) AS bigint) AS bin_id
           FROM surv)
SELECT source, bin_id, count(*) AS n_chunks,
       cast(sum(n_tokens) AS bigint) AS bin_tokens
FROM packed GROUP BY source, bin_id
ORDER BY source, bin_id""",
    tags=("curation", "chunking", "packing", "pipeline"),
)
def curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain as ONE lazy DataFrame DAG — stratified sample
    -> sliding-window chunking -> chunk-level dedup (first occurrence per
    fingerprint survives) -> per-source sequence packing — proving the
    stages compose without materialization between them (VERDICT round-2
    task #6). Catalyst sees the whole pipeline: the sample filter runs at
    the scan, chunking is map-side explode, and the only chunk-sized
    shuffles are the chunk_md5 dedup window, the source packing window, and
    the map-side-combinable bin aggregate; the final sort moves bin-level
    rows only. Shuffle count pinned by tests/test_plans.py.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    sampled = d.filter(
        F.expr(md5_mod_spark("cast(doc_id as string)", 100))
        < F.expr(_RATE_SPARK))
    c = (sampled.select("doc_id", "source",
                        F.split("text", " ").alias("toks"))
         .select("doc_id", "source", "toks",
                 F.explode(F.expr("sequence(0, size(toks) - 1, 12)"))
                 .alias("start")))
    chunk = F.slice("toks", F.col("start") + 1, 16)
    h = c.select("doc_id", "source",
                 (F.col("start") / 12).cast("int").alias("chunk_idx"),
                 F.size(chunk).alias("n_tokens"),
                 F.md5(F.array_join(chunk, " ")).alias("chunk_md5"))
    w_dedup = W.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    surv = (h.withColumn("rn", F.row_number().over(w_dedup))
            .filter(F.col("rn") == 1).drop("rn", "chunk_md5"))
    w_pack = (W.partitionBy("source").orderBy("doc_id", "chunk_idx")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    packed = surv.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w_pack) - F.col("n_tokens"))
                / float(_E2E_BIN)).cast("long"))
    return (packed.groupBy("source", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("n_tokens").alias("bin_tokens"))
            .orderBy("source", "bin_id"))
