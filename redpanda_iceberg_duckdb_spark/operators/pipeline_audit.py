"""Training-pipeline audits that compose the engine's own operators:
train/val/test split leakage through NEAR-duplicates, and per-dimension
embedding statistics for quantizer calibration.

split_leakage_audit is the check every LLM data pipeline must run before
trusting an eval split: a hash-stable 80/10/10 split is only sound if no
near-duplicate pair STRADDLES a split boundary (a test doc whose twin sits
in train is leaked supervision — the cross-split analogue of
decontamination against external benchmarks, cf. contamination.py). The
near-dup pair set is the PRODUCTION dedup path itself (df-capped
MinHash-LSH banding + exact-Jaccard verify from dedup.py — not a
reimplementation), so a green row also re-certifies that machinery under
composition.

Scale stance:
- Split assignment is one md5-mod map per row — stable under corpus
  growth (a doc's split never changes when other docs arrive), the
  property that makes incremental ingest safe.
- The audit join is pairs ⋈ splits twice on doc_id — pair count is
  near-linear in corpus size (LSH candidates), and the split table is a
  projection of the scan. The 3x3 class grid is a broadcast literal, so
  the output shape is fixed (6 rows) regardless of whether leakage exists.

embedding_dim_stats is the one-pass per-dimension profile (count, mean,
variance, min, max) a pipeline reads before choosing quantization ranges
or whitening (cf. quantizer.py). All moments are accumulated over
SCALED-INTEGER values (floor(x*1e4), the quantizer.py convention): bigint
sums are exact and order-independent, so both engines agree bitwise —
float addition never happens in an aggregate. One posexplode + one
aggregate; at 100 TB the sum-of-squares range says use decimal(38,0)
accumulators, noted inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table
from .dedup import _DF_CAP, _jaccard_verified, _lsh_cand_cte_duck, \
    lsh_candidates
from .shingles import (_JACCARD_VERIFY_DUCK, _TG_CTE_DUCK, _doc_trigram_sets,
                       _doc_trigrams)

_SPLITS = ["test", "train", "val"]   # lexicographic, for the class grid


def _split_case_duck(h: str) -> str:
    return (f"CASE WHEN {h} < 80 THEN 'train' "
            f"WHEN {h} < 90 THEN 'val' ELSE 'test' END")


@register(
    "split_leakage_audit",
    oracle=f"""
WITH {_TG_CTE_DUCK},
tcold AS (SELECT doc_id, tg FROM t
          QUALIFY count(*) OVER (PARTITION BY tg) <= {_DF_CAP}),
{_lsh_cand_cte_duck("tcold")},
{_JACCARD_VERIFY_DUCK.format(
    cand_filter="JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id")},
pairs AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
sp AS (SELECT doc_id,
              {_split_case_duck(
                  md5_mod_duck("'s:' || cast(doc_id AS varchar)", 100))}
                AS split
       FROM documents),
cls AS (SELECT least(s1.split, s2.split) AS split_a,
               greatest(s1.split, s2.split) AS split_b
        FROM pairs JOIN sp s1 ON s1.doc_id = pairs.d1
                   JOIN sp s2 ON s2.doc_id = pairs.d2),
grid AS (SELECT a.s AS split_a, b.s AS split_b
         FROM (VALUES ('test'), ('train'), ('val')) a(s),
              (VALUES ('test'), ('train'), ('val')) b(s)
         WHERE a.s <= b.s)
SELECT g.split_a, g.split_b,
       cast(count(cls.split_a) AS bigint) AS n_neardup_pairs,
       CASE WHEN g.split_a <> g.split_b THEN 'leak' ELSE 'contained' END
         AS verdict
FROM grid g
LEFT JOIN cls ON cls.split_a = g.split_a AND cls.split_b = g.split_b
GROUP BY g.split_a, g.split_b ORDER BY g.split_a, g.split_b""",
    tags=("dedup", "curation", "leakage", "composition"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs classified by the train/val/test splits of
    their endpoints (module docstring). Cross-split rows are leaked
    supervision; the fixed 6-row grid keeps the output shape stable even
    when a class is empty."""
    tg = _doc_trigrams(spark, sf_dir).localCheckpoint(eager=False)
    cand = lsh_candidates(tg, df_cap=_DF_CAP)
    pairs = _jaccard_verified(
        tg, cand, 0.5, doc_sets=_doc_trigram_sets(spark, sf_dir)
    ).select("d1", "d2")
    h = md5_mod_spark("concat('s:', cast(doc_id as string))", 100)
    sp = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"CASE WHEN {h} < 80 THEN 'train' "
               f"WHEN {h} < 90 THEN 'val' ELSE 'test' END").alias("split"))
    s1 = sp.select(F.col("doc_id").alias("d1"), F.col("split").alias("sp1"))
    s2 = sp.select(F.col("doc_id").alias("d2"), F.col("split").alias("sp2"))
    cls = (pairs.join(s1, "d1").join(s2, "d2")
           .select(F.least("sp1", "sp2").alias("split_a"),
                   F.greatest("sp1", "sp2").alias("split_b")))
    grid = spark.createDataFrame(
        [(a, b) for a in _SPLITS for b in _SPLITS if a <= b],
        "split_a string, split_b string")
    counts = (cls.groupBy("split_a", "split_b")
              .agg(F.count(F.lit(1)).alias("n")))
    return (grid.join(F.broadcast(counts), ["split_a", "split_b"], "left")
            .select("split_a", "split_b",
                    F.coalesce("n", F.lit(0)).cast("bigint")
                    .alias("n_neardup_pairs"),
                    F.when(F.col("split_a") != F.col("split_b"), "leak")
                    .otherwise("contained").alias("verdict"))
            .orderBy("split_a", "split_b"))


@register(
    "embedding_dim_stats",
    oracle="""
WITH q AS (
  SELECT k, cast(floor(cast(x AS double) * 1e4) AS bigint) AS qv
  FROM (SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS k
        FROM embeddings)),
agg AS (
  SELECT k, count(*) AS n, sum(qv) AS s, sum(qv * qv) AS s2,
         min(qv) AS mn, max(qv) AS mx
  FROM q GROUP BY k)
SELECT cast(k AS bigint) AS dim,
       cast(n AS bigint) AS n_values,
       round(cast(s AS double) / n / 1e4, 6) AS mean,
       round((cast(s2 AS double) / n
              - (cast(s AS double) / n) * (cast(s AS double) / n)) / 1e8, 6)
         AS variance,
       round(mn / 1e4, 6) AS min_value,
       round(mx / 1e4, 6) AS max_value
FROM agg ORDER BY dim""",
    tags=("similarity", "profile", "quantization"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding profile over scaled integers (module
    docstring): one posexplode + one map-side-combinable aggregate; the
    moments feed quantization-range / whitening decisions. At 100 TB the
    qv*qv sums approach int64 range around ~9e10 rows per dimension —
    swap the accumulators to decimal(38,0) there (the bpe/kmeans oracle
    convention); at shipped scales bigint is exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.select(F.posexplode("embedding").alias("k0", "x"))
         .select((F.col("k0") + 1).alias("k"),
                 F.floor(F.col("x").cast("double") * 1e4)
                 .cast("long").alias("qv")))
    agg = (q.groupBy("k")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("qv").alias("s"),
                F.sum(F.col("qv") * F.col("qv")).alias("s2"),
                F.min("qv").alias("mn"), F.max("qv").alias("mx")))
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    return (agg.select(
        F.col("k").cast("bigint").alias("dim"),
        F.col("n").cast("bigint").alias("n_values"),
        F.round(s / n / 1e4, 6).alias("mean"),
        F.round((F.col("s2").cast("double") / n - (s / n) * (s / n)) / 1e8,
                6).alias("variance"),
        F.round(F.col("mn") / 1e4, 6).alias("min_value"),
        F.round(F.col("mx") / 1e4, 6).alias("max_value"))
        .orderBy("dim"))
