"""Deduplication operators over ``documents`` (and embeddings): exact
content-hash dedup, n-gram Jaccard near-dup, MinHash-LSH, SimHash, and
embedding-cosine near-dup. Core training-data-pipeline operators beyond the
reference's surface (SURVEY.md section 7 / M6).

Scale design (100 TB stance):
- No global dictionaries or driver-side state: shingles/tokens are hashed with
  a cross-engine-deterministic md5-derived u64 (functions/hashing.py), so the
  pipeline is embarrassingly parallel until the candidate-pair join.
- MinHash signatures are one groupBy over exploded shingles (single shuffle);
  banding multiplies rows by #bands (4), and the LSH bucket join only pairs
  docs sharing a band — the quadratic blowup of naive all-pairs never occurs.
- The n-gram Jaccard all-pairs operator IS quadratic in docs sharing a
  trigram; it exists as the exactness baseline. At scale, use minhash_lsh
  (same threshold) and let the verify step bound false positives.
- Hot shingles (stopword trigrams) skew the tg join; session enables AQE skew
  splitting. A production hardening would drop top-frequency shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import (
    MERSENNE_P, MINHASH_A, MINHASH_B, MINHASH_K,
    md5_mod_spark, md5_mod_duck,
)
from ..registry import register
from ..tables import load_table, load_table_spread
from .shingles import (  # shared with clusters.py; no registrations there
    _TG_CTE_DUCK, _JACCARD_VERIFY_DUCK,
    _doc_trigrams, _doc_trigram_sets, _jaccard_verified, _jaccard_from_shared,
)

# ---------------------------------------------------------------- exact dedup


@register(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS content_hash,
       cast(min(doc_id) AS bigint) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY content_hash""",
    tags=("dedup",),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one hash-aggregate, fully parallel.
    keep_id = lowest doc_id per identical text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("content_hash")
    )


@register(
    "dedup_exact_survivors",
    oracle="""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
  FROM documents)
WHERE rn = 1
ORDER BY doc_id""",
    tags=("dedup",),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus (first doc per content hash) — dropDuplicates
    semantics but with a deterministic keep rule (min doc_id), which plain
    dropDuplicates does not guarantee."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return (d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1).drop("rn").orderBy("doc_id"))


# ------------------------------------------------------------ n-gram Jaccard


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_JACCARD_VERIFY_DUCK.format(cand_filter="")}
SELECT d1, d2, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY d1, d2""",
    tags=("dedup",),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (threshold 0.5) via
    shared-shingle self-join — the exactness baseline for minhash_lsh_pairs.
    Deliberately NOT a bench headline: the all-pairs shared-shingle join is
    quadratic in docs per hot shingle, the plan you would never run at
    100 TB (minhash_lsh_pairs is the scale path and the dedup headline)."""
    tg = _doc_trigrams(spark, sf_dir)
    sz = tg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tg.select(F.col("doc_id").alias("d1"), "tg")
    b = tg.select(F.col("doc_id").alias("d2"), "tg")
    shared = (a.join(b, "tg").filter(F.col("d1") < F.col("d2"))
              .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("c")))
    return _jaccard_from_shared(shared, sz, 0.5).orderBy("d1", "d2")


# ---------------------------------------------------------------- MinHash LSH

_A_LIST = ", ".join(str(a) for a in MINHASH_A)
_B_LIST = ", ".join(str(b) for b in MINHASH_B)

# Shared CTE: trigrams (t) -> minhash signatures -> band keys -> candidate
# pairs (cand). Reused by minhash_lsh_pairs and containment_pairs oracles.
# The shingle source table is templated ({src}) so the df-capped variant can
# band over the cold-shingle subset while verification stays on full t.
def _lsh_cand_cte_duck(src: str) -> str:
    return f"""
hs AS (SELECT doc_id, {md5_mod_duck("tg")} AS h FROM {src}),
params AS (SELECT unnest(range({MINHASH_K})) AS k,
                  unnest([{_A_LIST}]) AS a,
                  unnest([{_B_LIST}]) AS b),
sig AS (SELECT doc_id, k, min((a * h + b) % {MERSENNE_P}) AS m
        FROM hs, params GROUP BY doc_id, k),
bands AS (SELECT doc_id, k // 4 AS band,
                 string_agg(cast(m AS varchar), '_' ORDER BY k) AS bkey
          FROM sig GROUP BY doc_id, k // 4),
cand AS (SELECT DISTINCT x.doc_id d1, y.doc_id d2
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
"""


_LSH_CAND_CTE_DUCK = _lsh_cand_cte_duck("t")


def lsh_bands(tg: DataFrame, *, df_cap: int | None = None) -> DataFrame:
    """MinHash band table (doc_id, band, bkey) from a (doc_id, tg) shingle
    table: 16 min-aggregates in one groupBy (single shuffle), 4 band keys
    per doc. Joining this table to itself on (band, bkey) yields the
    near-linear candidate generator behind minhash_lsh_pairs and
    containment_pairs (lsh_candidates); joining a FILTERED copy against
    the full table gives the incremental new-batch-only candidates
    (incremental_dedup.py) — same signatures, restricted join.

    ``df_cap`` drops shingles whose document frequency exceeds the cap
    BEFORE signatures are built — the production hardening against hot
    (stopword-phrase) shingles, which otherwise skew the band join: a
    shingle shared by a million docs contributes nothing to near-dup
    discrimination but dominates the signature aggregate's hottest key.
    Verification downstream still runs on the FULL shingle sets, so exact
    Jaccard scores are unaffected; only candidate generation ignores the
    hot shingles."""
    if df_cap is not None:
        # tg is distinct per (doc_id, tg), so count(*) per tg IS the doc
        # frequency. One extra aggregate + equi-join, both on the already-
        # shuffled tg key — AQE coalesces; no new skew introduced.
        dfreq = tg.groupBy("tg").agg(F.count(F.lit(1)).alias("df"))
        tg = tg.join(dfreq.filter(F.col("df") <= df_cap).select("tg"), "tg")
    hs = tg.select("doc_id", F.expr(md5_mod_spark("tg")).alias("h"))
    sig = hs.groupBy("doc_id").agg(*[
        F.min((F.lit(MINHASH_A[k]) * F.col("h") + F.lit(MINHASH_B[k]))
              % MERSENNE_P).alias(f"m{k}")
        for k in range(MINHASH_K)
    ])
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[F.col(f"m{4 * b + j}").cast("string")
                               for j in range(4)]).alias("bkey"),
        )
        for b in range(MINHASH_K // 4)
    ])
    # localCheckpoint, not persist: bands feeds BOTH sides of the self-join
    # below, so it must be materialized once — but a DataFrame persist()
    # stays in the session CacheManager forever (this function returns a
    # lazy plan; there is no safe unpersist point), leaking one cached
    # band table PER CALL in a long-lived session. localCheckpoint blocks
    # are released by the ContextCleaner when the plan is GC'd.
    return (sig.select("doc_id", F.explode(band_structs).alias("bs"))
            .select("doc_id", F.col("bs.band").alias("band"),
                    F.col("bs.bkey").alias("bkey"))
            .localCheckpoint(eager=False))


def lsh_candidates(tg: DataFrame, *, df_cap: int | None = None) -> DataFrame:
    """MinHash-LSH candidate pairs (d1 < d2) from the band table — see
    lsh_bands for the signature/banding plan shape."""
    bands = lsh_bands(tg, df_cap=df_cap)
    x = bands.select(F.col("doc_id").alias("d1"), "band", "bkey")
    y = bands.select(F.col("doc_id").alias("d2"), "band", "bkey")
    return (x.join(y, ["band", "bkey"]).filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2").distinct())


@register(
    "minhash_lsh_pairs",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_LSH_CAND_CTE_DUCK},
{_JACCARD_VERIFY_DUCK.format(
    cand_filter="JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id")}
SELECT d1, d2, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY d1, d2""",
    tags=("dedup", "lsh"),
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (K=16) + LSH banding (4 bands x 4 rows) near-dup detection,
    verified with exact Jaccard >= 0.5 on candidates only.

    Scale path: shingle hash -> 16 min-aggregates in ONE groupBy (single
    shuffle) -> 4 band keys per doc -> equi-join on (band, key). Never
    compares docs that share no band. With s=0.5: P(candidate) =
    1-(1-s^4)^4 ≈ 0.23 at the threshold, ~0.9 at s=0.8 — verification
    restores exactness.
    """
    # r15 optimization (guide §2.3/§2.4): ONE documents scan feeds both
    # candidate generation and verification. The per-doc distinct-shingle
    # ARRAY table is checkpointed once; the exploded shingle table the
    # signature build needs is a map-side explode of those cached arrays
    # (array_distinct already deduplicated per doc, so the old global
    # .distinct() exchange disappears), and verification reads the same
    # cached arrays instead of re-scanning + re-shingling the corpus.
    # Before: 2 scans + 2 spread shuffles + a distinct exchange; after:
    # 1 scan + 1 spread shuffle. Measured: 1.9 -> 1.1 s warm at sf0.1.
    ds = _doc_trigram_sets(spark, sf_dir).localCheckpoint(eager=False)
    tg = ds.select("doc_id", F.explode("tgs").alias("tg"))
    cand = lsh_candidates(tg)
    return (_jaccard_verified(tg, cand, 0.5, doc_sets=ds)
            .orderBy("d1", "d2"))


# Document-frequency cap for the hardened LSH path: shingles shared by more
# docs than this are excluded from signature building (never from verify).
_DF_CAP = 64


@register(
    "minhash_lsh_pairs_dfcap",
    oracle=f"""
WITH {_TG_CTE_DUCK},
tcold AS (SELECT doc_id, tg FROM t
          QUALIFY count(*) OVER (PARTITION BY tg) <= {_DF_CAP}),
{_lsh_cand_cte_duck("tcold")},
{_JACCARD_VERIFY_DUCK.format(
    cand_filter="JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id")}
SELECT d1, d2, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY d1, d2""",
    bench=True,  # r7: headline tracks the production (capped) LSH path;
                 # the uncapped variant stays registered for correctness
    tags=("dedup", "lsh"),
)
def minhash_lsh_pairs_dfcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minhash_lsh_pairs with the hot-shingle hardening applied: shingles
    with document frequency > 64 are dropped before signature/banding (the
    docstring note at the top of this module, now implemented). Exact-Jaccard
    verification still runs on full shingle sets, so every reported score is
    identical to the uncapped path's; only candidate RECALL can differ, and
    tests/test_planted_neardups.py proves the planted near-dup pair set is
    unchanged. At 100 TB this cap is what keeps the (band, key) join free of
    the stopword-phrase hot keys that AQE would otherwise have to split."""
    # r15 optimization (guide §2.3/§2.4, same shape as minhash_lsh_pairs):
    # ONE documents scan -> checkpointed per-doc distinct-shingle arrays;
    # the exploded shingle table (df-frequency count + signature build)
    # is a map-side explode of the cached arrays, and verification reads
    # the same arrays — the second corpus scan, second spread shuffle,
    # and the global distinct exchange all disappear. localCheckpoint,
    # not persist: the returned DataFrame is lazy and a CacheManager
    # entry would leak per call (no safe unpersist point here).
    # Measured: 2.8 -> 1.6 s warm at sf0.1.
    ds = _doc_trigram_sets(spark, sf_dir).localCheckpoint(eager=False)
    tg = ds.select("doc_id", F.explode("tgs").alias("tg"))
    cand = lsh_candidates(tg, df_cap=_DF_CAP)
    return (_jaccard_verified(tg, cand, 0.5, doc_sets=ds)
            .orderBy("d1", "d2"))


# ------------------------------------------------------------------- SimHash

_SIMHASH_CTE_DUCK = f"""
tok AS (SELECT doc_id, tok, count(*) c FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents)
        GROUP BY doc_id, tok),
th AS (SELECT doc_id, c, {md5_mod_duck("tok", 4_294_967_296)} AS h FROM tok),
bitsum AS (SELECT doc_id, k,
                  sum(c * (2 * ((h >> k) & 1) - 1)) AS s
           FROM th, unnest(range(32)) r(k) GROUP BY doc_id, k),
sh AS (SELECT doc_id,
              cast(sum(CASE WHEN s > 0 THEN (cast(1 AS bigint) << k)
                            ELSE 0 END) AS bigint) AS simhash
       FROM bitsum GROUP BY doc_id)
"""


@register(
    "simhash_signatures",
    oracle=f"WITH {_SIMHASH_CTE_DUCK} SELECT doc_id, simhash FROM sh ORDER BY doc_id",
    tags=("dedup", "simhash"),
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit term-frequency-weighted SimHash per document. Fully parallel:
    explode tokens -> per-(doc, bit) signed sums -> recombine bits. The
    per-token md5 runs over the spread view (tables.load_table_spread) so
    the hash work parallelizes despite the single-split testdata."""
    load_table_spread(spark, sf_dir, "documents", "doc_id") \
        .createOrReplaceTempView("documents_spread")
    return spark.sql(f"""
WITH tok AS (SELECT doc_id, tok, count(*) c FROM
               (SELECT doc_id, explode(split(text, ' ')) tok
                FROM documents_spread)
             GROUP BY doc_id, tok),
th AS (SELECT doc_id, c, {md5_mod_spark("tok", 4_294_967_296)} AS h FROM tok),
bitsum AS (SELECT doc_id, k, sum(c * (2 * ((h >> k) & 1) - 1)) AS s
           FROM th LATERAL VIEW explode(sequence(0, 31)) AS k
           GROUP BY doc_id, k),
sh AS (SELECT doc_id,
              cast(sum(CASE WHEN s > 0 THEN shiftleft(cast(1 AS bigint), k)
                            ELSE 0 END) AS bigint) AS simhash
       FROM bitsum GROUP BY doc_id)
SELECT doc_id, simhash FROM sh ORDER BY doc_id""")


@register(
    "simhash_near_dup_pairs",
    oracle=f"""
WITH {_SIMHASH_CTE_DUCK},
bands AS (SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS byte
          FROM sh, unnest(range(4)) r(b)),
cand AS (SELECT DISTINCT x.doc_id d1, x.simhash s1, y.doc_id d2, y.simhash s2
         FROM bands x JOIN bands y
           ON x.b = y.b AND x.byte = y.byte AND x.doc_id < y.doc_id)
SELECT d1, d2, cast(bit_count(xor(s1, s2)) AS int) AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= 6
ORDER BY d1, d2""",
    tags=("dedup", "simhash"),
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: byte-banding (4 bands of 8 bits — any doc pair
    within Hamming distance <=6 that shares a byte band becomes a candidate)
    then exact Hamming filter. Same LSH shape as MinHash: no all-pairs scan.
    Token hashing runs over the spread view (tables.load_table_spread)."""
    load_table_spread(spark, sf_dir, "documents", "doc_id") \
        .createOrReplaceTempView("documents_spread")
    return spark.sql(f"""
WITH tok AS (SELECT doc_id, tok, count(*) c FROM
               (SELECT doc_id, explode(split(text, ' ')) tok
                FROM documents_spread)
             GROUP BY doc_id, tok),
th AS (SELECT doc_id, c, {md5_mod_spark("tok", 4_294_967_296)} AS h FROM tok),
bitsum AS (SELECT doc_id, k, sum(c * (2 * ((h >> k) & 1) - 1)) AS s
           FROM th LATERAL VIEW explode(sequence(0, 31)) AS k
           GROUP BY doc_id, k),
sh AS (SELECT doc_id,
              cast(sum(CASE WHEN s > 0 THEN shiftleft(cast(1 AS bigint), k)
                            ELSE 0 END) AS bigint) AS simhash
       FROM bitsum GROUP BY doc_id),
bands AS (SELECT doc_id, simhash, b, shiftright(simhash, 8 * b) & 255 AS byte
          FROM sh LATERAL VIEW explode(sequence(0, 3)) AS b),
cand AS (SELECT DISTINCT x.doc_id d1, x.simhash s1, y.doc_id d2, y.simhash s2
         FROM bands x JOIN bands y
           ON x.b = y.b AND x.byte = y.byte AND x.doc_id < y.doc_id)
SELECT d1, d2, cast(bit_count(s1 ^ s2) AS int) AS hamming
FROM cand WHERE bit_count(s1 ^ s2) <= 6
ORDER BY d1, d2""")


@register(
    "lsh_recall_vs_exact",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_JACCARD_VERIFY_DUCK.format(cand_filter="")},
exact AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
{_LSH_CAND_CTE_DUCK},
hits AS (SELECT e.d1, e.d2 FROM exact e
         JOIN cand c ON c.d1 = e.d1 AND c.d2 = e.d2)
SELECT cast((SELECT count(*) FROM exact) AS bigint) AS n_exact_pairs,
       cast((SELECT count(*) FROM hits) AS bigint) AS n_lsh_found,
       round(CASE WHEN (SELECT count(*) FROM exact) = 0 THEN 1.0
                  ELSE (SELECT count(*) FROM hits) * 1.0
                       / (SELECT count(*) FROM exact) END, 6) AS recall""",
    tags=("dedup", "lsh", "evaluation"),
)
def lsh_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH index's evaluation harness as a query: candidate recall of
    MinHash banding against the exact all-pairs Jaccard >= 0.5 ground truth
    — the number that justifies replacing the quadratic baseline with the
    banded index (companion to ann_ivf_recall_at_k on the embedding side).

    Scale stance: ground truth is the documented-quadratic exactness
    baseline, so in production this runs on a SAMPLED stratum while the LSH
    side indexes the full corpus; here both run on the fixture corpus where
    tests already prove the sets coincide. One row out; both pair sets
    reduce through a single count aggregate each."""
    exact = (ngram_jaccard_pairs(spark, sf_dir)
             .select("d1", "d2"))
    cand = lsh_candidates(_doc_trigrams(spark, sf_dir)).select("d1", "d2")
    hits = exact.join(cand, ["d1", "d2"])
    return (exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_lsh_found")))
            .select("n_exact_pairs", "n_lsh_found",
                    F.round(F.when(F.col("n_exact_pairs") == 0, 1.0)
                            .otherwise(F.col("n_lsh_found")
                                       / F.col("n_exact_pairs")), 6)
                     .alias("recall")))
