"""Benchmark decontamination + intra-corpus containment — the integrity
checks a training corpus runs before a model ever sees it: (1) does any
training doc overlap an evaluation benchmark, (2) is any doc a near-superset
of another (template expansion, quoting, concatenation), (3) how internally
repetitive is each doc.

Scale design (100 TB stance):
- Decontamination joins the CORPUS side (huge) against the BENCHMARK side
  (small, broadcast) on shingles — the corpus is never self-joined, so cost
  is linear in corpus shingles.
- Containment reuses the MinHash-LSH candidate generator (dedup.py
  lsh_candidates): no all-pairs scan. Jaccard-banding is tuned for
  symmetric similarity, so asymmetric high-containment pairs with low
  Jaccard (tiny doc inside huge doc) can escape every band — documented
  recall bound; the standard fix at scale is a second banding on the small
  side's signature alone.
- Repetition scoring is one aggregate over exploded shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table
from .dedup import _LSH_CAND_CTE_DUCK, lsh_candidates
from .shingles import _TG_ARRAY_SPARK, _TG_CTE_DUCK, _doc_trigrams

# Benchmark stand-in: every 25th doc plays the eval set (deterministic,
# re-derivable in both engines). In production this is a real benchmark
# table (MMLU/GSM8K/... n-gram dumps) broadcast the same way.
_BENCH_PRED = "doc_id % 25 = 0"


@register(
    "decontamination_overlap",
    oracle=f"""
WITH {_TG_CTE_DUCK},
bench AS (SELECT * FROM t WHERE {_BENCH_PRED}),
corp AS (SELECT * FROM t WHERE NOT ({_BENCH_PRED})),
sz AS (SELECT doc_id, count(*) n FROM corp GROUP BY doc_id),
ov AS (SELECT c.doc_id AS doc_id, b.doc_id AS bench_doc_id, count(*) AS c
       FROM corp c JOIN bench b USING (tg) GROUP BY 1, 2),
scored AS (SELECT doc_id, bench_doc_id,
                  round(c * 1.0 / n, 6) AS overlap,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, bench_doc_id) AS rn
           FROM ov JOIN sz USING (doc_id))
SELECT doc_id, bench_doc_id, overlap
FROM scored WHERE rn = 1 AND overlap >= 0.05
ORDER BY doc_id""",
    tags=("contamination", "pipeline"),
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each training doc's distinct
    trigrams that appear in any benchmark doc; flags docs over 5% overlap
    with their worst-offending benchmark doc. The benchmark shingle table
    broadcasts onto the corpus scan — one shuffle (the per-pair count),
    linear in corpus size."""
    # tg feeds the bench slice, the corpus slice, and the size table —
    # persist it once instead of re-deriving the explode per consumer.
    tg = _doc_trigrams(spark, sf_dir).localCheckpoint(eager=True)
    bench = tg.filter(F.expr(_BENCH_PRED))
    corp = tg.filter(~F.expr(_BENCH_PRED))
    sz = corp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ov = (corp.join(F.broadcast(bench.withColumnRenamed(
              "doc_id", "bench_doc_id")), "tg")
          .groupBy("doc_id", "bench_doc_id")
          .agg(F.count(F.lit(1)).alias("c")))
    scored = (ov.join(sz, "doc_id")
              .withColumn("overlap", F.round(F.col("c") / F.col("n"), 6))
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("doc_id")
                  .orderBy(F.desc("c"), "bench_doc_id"))))
    return (scored.filter((F.col("rn") == 1) & (F.col("overlap") >= 0.05))
            .select("doc_id", "bench_doc_id", "overlap")
            .orderBy("doc_id"))


@register(
    "doc_repetition_score",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
t AS (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS tg
      FROM w, unnest(range(greatest(len(ws) - 2, 0))) r(i))
SELECT doc_id,
       count(*) AS n_trigrams,
       count(DISTINCT tg) AS n_distinct,
       round(1.0 - count(DISTINCT tg) * 1.0 / count(*), 6) AS repetition
FROM t GROUP BY doc_id
ORDER BY doc_id""",
    tags=("contamination", "quality"),
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal repetition per document: 1 - distinct/total trigram ratio —
    the boilerplate/loop-generated-text signal used to downweight or drop
    docs before training. One explode + one aggregate; no joins. (Note this
    trigram stream keeps repeats — _doc_trigrams dedups, so it builds its
    own explode.)"""
    d = load_table(spark, sf_dir, "documents")
    # explode_outer + post-filter: avoids the inferred Generate predicate
    # re-running the trigram transform at the scan (see shingles).
    t = (d.select("doc_id", F.split("text", " ").alias("ws"))
         .select("doc_id",
                 F.explode_outer(F.expr(_TG_ARRAY_SPARK)).alias("tg"))
         .filter(F.col("tg").isNotNull()))
    return (t.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 F.countDistinct("tg").alias("n_distinct"),
                 F.round(F.lit(1.0) - F.countDistinct("tg") / F.count(F.lit(1)),
                         6).alias("repetition"))
            .orderBy("doc_id"))


@register(
    "containment_pairs",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_LSH_CAND_CTE_DUCK},
sz AS (SELECT doc_id, count(*) n FROM t GROUP BY doc_id),
shared AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
           FROM t a JOIN t b ON a.tg = b.tg AND a.doc_id < b.doc_id
           JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id
           GROUP BY 1, 2),
cont AS (SELECT d1, d2,
                round(c * 1.0 / least(s1.n, s2.n), 6) AS containment
         FROM shared JOIN sz s1 ON s1.doc_id = d1
                     JOIN sz s2 ON s2.doc_id = d2)
SELECT d1, d2, containment FROM cont
WHERE containment >= 0.6 ORDER BY d1, d2""",
    tags=("contamination", "dedup", "lsh"),
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-superset detection: containment = |A∩B| / min(|A|, |B|) over
    MinHash-LSH candidate pairs — catches a doc embedded inside a larger
    one, which symmetric Jaccard under-scores (|A∩B|/|A∪B| is small when
    sizes differ wildly). Candidates come from the same single-shuffle LSH
    path as minhash_lsh_pairs; only the verify metric differs."""
    tg = _doc_trigrams(spark, sf_dir).localCheckpoint(eager=True)
    cand = lsh_candidates(tg)
    sz = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    d1_shingles = F.broadcast(cand).join(
        tg.select(F.col("doc_id").alias("d1"), "tg"), "d1")
    shared = (d1_shingles
              .join(tg.select(F.col("doc_id").alias("d2"), "tg"),
                    ["d2", "tg"])
              .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("c")))
    return (shared
            .join(sz.select(F.col("doc_id").alias("d1"),
                            F.col("n").alias("n1")), "d1")
            .join(sz.select(F.col("doc_id").alias("d2"),
                            F.col("n").alias("n2")), "d2")
            .select("d1", "d2",
                    F.round(F.col("c") / F.least("n1", "n2"), 6)
                    .alias("containment"))
            .filter(F.col("containment") >= 0.6)
            .orderBy("d1", "d2"))


@register(
    "containment_closure",
    oracle=f"""
WITH RECURSIVE {_TG_CTE_DUCK},
{_LSH_CAND_CTE_DUCK},
sz AS (SELECT doc_id, count(*) n FROM t GROUP BY doc_id),
shared AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
           FROM t a JOIN t b ON a.tg = b.tg AND a.doc_id < b.doc_id
           JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id
           GROUP BY 1, 2),
edges AS (SELECT d1, d2
          FROM shared JOIN sz s1 ON s1.doc_id = d1
                      JOIN sz s2 ON s2.doc_id = d2
          WHERE c * 1.0 / least(s1.n, s2.n) >= 0.6),
walk(src, dst, hops) AS (
  SELECT d1, d2, 1 FROM edges
  UNION ALL
  SELECT w.src, e.d2, w.hops + 1
  FROM walk w JOIN edges e ON e.d1 = w.dst)
SELECT src AS d_src, dst AS d_dst, cast(min(hops) AS int) AS min_hops
FROM walk GROUP BY src, dst
ORDER BY d_src, d_dst""",
    tags=("contamination", "dedup", "recursive"),
)
def containment_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the containment DAG via Spark 4's WITH
    RECURSIVE: if A is near-contained in B and B in C, then (A, C) is a
    2-hop containment — the lineage chain a curation pipeline follows to
    collapse nested boilerplate families, which pairwise containment alone
    misses. The recursion is guaranteed to terminate without set-dedup
    (Spark supports only UNION ALL in recursive CTEs): every edge goes
    strictly small-id -> big-id, so the graph is acyclic and every path is
    finite. min(hops) collapses path multiplicity."""
    pairs = containment_pairs(spark, sf_dir).select("d1", "d2")
    pairs.createOrReplaceTempView("_containment_edges")
    return spark.sql(_CLOSURE_SQL)


# Shared by containment_closure and the planted multi-hop unit test (the
# fixture corpora have no >1-hop chains, so the recursion tail is proven on
# planted edges in tests/test_scale_patterns.py).
_CLOSURE_SQL = """
WITH RECURSIVE walk(src, dst, hops) AS (
  SELECT d1, d2, 1 FROM _containment_edges
  UNION ALL
  SELECT w.src, e.d2, w.hops + 1
  FROM walk w JOIN _containment_edges e ON e.d1 = w.dst)
SELECT src AS d_src, dst AS d_dst, cast(min(hops) AS int) AS min_hops
FROM walk GROUP BY src, dst
ORDER BY d_src, d_dst"""


# --- Bloom-filter decontamination -----------------------------------------

_BLOOM_M = 65_536   # bits
_BLOOM_K = 3        # hash positions per shingle

_BLOOM_ORACLE = f"""
WITH {{tg_cte}},
bench_tg AS (SELECT DISTINCT tg FROM t WHERE {{bench}}),
js AS (SELECT unnest(range({_BLOOM_K})) AS j),
bits AS (SELECT DISTINCT
            {{pos_duck}} AS pos
         FROM bench_tg, js),
ctg AS (SELECT DISTINCT tg FROM t WHERE NOT ({{bench}})),
probe AS (SELECT tg, j, {{pos_duck}} AS pos FROM ctg, js),
hits AS (SELECT tg FROM probe JOIN bits USING (pos)
         GROUP BY tg HAVING count(*) = {_BLOOM_K}),
corp AS (SELECT t.doc_id, t.tg, (h.tg IS NOT NULL) AS hit
         FROM t LEFT JOIN hits h ON t.tg = h.tg
         WHERE NOT ({{bench}})),
per_doc AS (SELECT doc_id, count(*) AS n_trigrams,
                   cast(sum(cast(hit AS int)) AS bigint) AS n_hit
            FROM corp GROUP BY doc_id)
SELECT doc_id, n_trigrams, n_hit,
       round(n_hit * 1.0 / n_trigrams, 6) AS bloom_overlap
FROM per_doc WHERE n_hit * 1.0 / n_trigrams >= 0.05
ORDER BY doc_id"""


@register(
    "bloom_ngram_decontamination",
    oracle=_BLOOM_ORACLE.format(
        tg_cte=_TG_CTE_DUCK.strip(),
        bench=_BENCH_PRED,
        pos_duck=md5_mod_duck("tg || ':' || cast(j AS varchar)", _BLOOM_M)),
    tags=("contamination", "bloom", "sketch"),
)
def bloom_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter instead of the
    exact shingle join: the benchmark's trigrams are folded into a
    65536-bit / k=3 Bloom bit-set, corpus trigrams are flagged when ALL k
    md5-derived positions are set, and docs with >= 5% flagged trigrams
    are reported. Semantics are DEFINED as Bloom semantics — false
    positives are part of the contract and both engines compute the
    identical deterministic bit-set, so the result is still exact to the
    oracle.

    Why this exists next to decontamination_overlap (the exact join): at
    100 TB the benchmark n-gram set can reach billions of entries — too
    big to broadcast as strings — while its Bloom image is a fixed
    m/8-byte array PER EXECUTOR regardless of benchmark cardinality; probe
    cost is k hashes per corpus shingle, map-side. This query keeps the
    bit-set as a broadcastable distinct-position table to stay
    oracle-checkable; a pure-Spark deployment would pack it into an actual
    bitmask via spark.util.sketch.BloomFilter with the same layout
    decision. FP rate at these parameters: (1 - e^(-kn/m))^k — the 5%
    doc-level threshold makes individual shingle FPs harmless."""
    tg = _doc_trigrams(spark, sf_dir).localCheckpoint(eager=True)
    bench_tg = tg.filter(F.expr(_BENCH_PRED)).select("tg").distinct()
    positions = F.expr(
        "array(" + ", ".join(
            md5_mod_spark(f"concat(tg, ':', {j})", _BLOOM_M)
            for j in range(_BLOOM_K)) + ")")
    bits = (bench_tg.select(F.explode(positions).alias("pos")).distinct())
    ctg = tg.filter(~F.expr(_BENCH_PRED)).select("tg").distinct()
    probe = ctg.select("tg", F.posexplode(positions).alias("j", "pos"))
    hits = (probe.join(F.broadcast(bits), "pos")
            .groupBy("tg").agg(F.count(F.lit(1)).alias("k_hit"))
            .filter(F.col("k_hit") == _BLOOM_K).select("tg"))
    corp = (tg.filter(~F.expr(_BENCH_PRED))
            .join(hits.withColumn("hit", F.lit(1)), "tg", "left"))
    per_doc = (corp.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_trigrams"),
                    F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint")
                     .alias("n_hit")))
    return (per_doc
            .withColumn("bloom_overlap",
                        F.round(F.col("n_hit") / F.col("n_trigrams"), 6))
            .filter(F.col("n_hit") / F.col("n_trigrams") >= 0.05)
            .select("doc_id", "n_trigrams", "n_hit", "bloom_overlap")
            .orderBy("doc_id"))
