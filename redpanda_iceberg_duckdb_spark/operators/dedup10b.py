"""Sorted-neighborhood dedup blocking (Hernandez & Stolfo, SIGMOD 1995)
— the third blocking family beside the repo's MinHash-LSH bands and
PPJoin prefix filter: sort once by a cheap key (here the 32-char
lowercase text prefix), then only compare records within a sliding rank
window of w. The query grades the method itself: for each rank distance
d = 1..w, how many candidate pairs were generated and how many verify as
near-duplicates (5-gram Jaccard >= 0.8) — on this corpus the dup mass
concentrates at d=1, the SNM selling point.

Exactness: the Jaccard verdict is the integer cross-multiplication
5*common >= 4*(|A|+|B|-common) — no floating thresholds; outputs are
pure counts.

Scale: the global sort rank uses the repo's two-phase pattern (bucket by
the key's first byte -> within-bucket row_number windows -> tiny
cumulative bucket offsets broadcast back), so no single-partition window
touches the corpus; the w-window pairing is a BANDED EQUI-JOIN on
block = rank div w with the probe side exploded to its two covering
blocks — never an all-pairs product. Verification joins only candidate
pairs to the shingle table (distinct 5-grams), the same df-bounded shape
as the LSH verify stage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_WIN = 4          # SNM window: compare ranks within distance <= w
_KEYLEN = 32
_NGRAM = 5
# Jaccard >= 0.8 as integers: c/(na+nb-c) >= 4/5  <=>  5c >= 4(na+nb-c)
_JNUM, _JDEN = 4, 5


def _oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lower(text) AS t,
         substr(lower(text), 1, {_KEYLEN}) AS k
  FROM documents),
ranked AS (
  SELECT doc_id, k,
         row_number() OVER (ORDER BY k, doc_id) AS rank
  FROM d),
cand AS (
  SELECT a.doc_id AS i, b.doc_id AS j,
         b.rank - a.rank AS dist
  FROM ranked a JOIN ranked b
    ON b.rank > a.rank AND b.rank <= a.rank + {_WIN}),
sh AS (
  SELECT DISTINCT doc_id,
         substr(t, cast(g.i AS int) + 1, {_NGRAM}) AS s
  FROM d, lateral (SELECT unnest(range(len(t) - {_NGRAM} + 1)) AS i) g),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.dist, c.i, c.j, count(*) AS c
  FROM cand c JOIN sh a ON a.doc_id = c.i
              JOIN sh b ON b.doc_id = c.j AND b.s = a.s
  GROUP BY c.dist, c.i, c.j),
verified AS (
  SELECT co.dist, count(*) AS n_verified
  FROM common co JOIN sz x ON x.doc_id = co.i
                 JOIN sz y ON y.doc_id = co.j
  WHERE {_JDEN} * co.c >= {_JNUM} * (x.n + y.n - co.c)
  GROUP BY co.dist),
counts AS (
  SELECT dist, count(*) AS n_candidates FROM cand GROUP BY dist)
SELECT c.dist AS dist, cast(c.n_candidates AS bigint) AS n_candidates,
       cast(coalesce(v.n_verified, 0) AS bigint) AS n_verified
FROM counts c LEFT JOIN verified v ON v.dist = c.dist
ORDER BY c.dist"""


@register(
    "sorted_neighborhood_pairs",
    oracle=_oracle(),
    tags=("dedup", "blocking", "scale-pattern"),
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dist, n_candidates, n_verified): sorted-neighborhood candidate
    pairs at each rank distance 1..w and how many verify at 5-gram
    Jaccard >= 0.8; two-phase global ranks + banded equi-join (module
    docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.lower("text").alias("t"),
        F.substring(F.lower("text"), 1, _KEYLEN).alias("k"))
    # Two-phase global rank: bucket by the key's first byte.
    keyed = d.withColumn("b", F.substring("k", 1, 1))
    wb = W.partitionBy("b").orderBy("k", "doc_id")
    local = keyed.withColumn("lrn", F.row_number().over(wb))
    totals = keyed.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    wo = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offs = (totals
            .withColumn("off", F.coalesce(F.sum("cnt").over(wo), F.lit(0)))
            .select("b", "off"))
    # Checkpointed: ranked feeds the band-join left side, the probe side
    # AND the shingle build, and without the checkpoint each branch
    # re-ran the scan + two-phase global rank (16 documents scans in one
    # plan, r15 scan audit; 1 after). The shingle table is NOT
    # checkpointed: materializing it measured ~3x worse than the 3x
    # explode recompute over this checkpoint (row-format reads of the
    # corpus-sized frame, the r12 gotcha).
    ranked = (local.join(F.broadcast(offs), "b")
              .select("doc_id", "t",
                      (F.col("lrn") + F.col("off")).alias("rank"))
              ).localCheckpoint(eager=True)
    # Banded w-window join: left block q pairs with probe blocks {q, q+1}.
    left = ranked.select(F.col("doc_id").alias("i"),
                         F.col("rank").alias("ra"),
                         F.expr(f"rank div {_WIN}").alias("blk"))
    probe = (ranked.select(F.col("doc_id").alias("j"),
                           F.col("rank").alias("rb"))
             .withColumn("blk", F.explode(F.array(
                 F.expr(f"rb div {_WIN}"),
                 F.expr(f"rb div {_WIN} - 1")))))
    cand = (left.join(probe, "blk")
            .filter((F.col("rb") > F.col("ra"))
                    & (F.col("rb") <= F.col("ra") + _WIN))
            .select("i", "j", (F.col("rb") - F.col("ra")).alias("dist")))
    sh = (ranked.select(
        "doc_id",
        F.explode(F.sequence(
            F.lit(0), F.length("t") - _NGRAM)).alias("p"),
        "t")
        .select("doc_id",
                F.col("t").substr(F.col("p") + 1, F.lit(_NGRAM)).alias("s"))
        .distinct())
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (cand
              .join(sh.select(F.col("doc_id").alias("i"),
                              F.col("s").alias("s")), "i")
              .join(sh.select(F.col("doc_id").alias("j"),
                              F.col("s").alias("s")), ["j", "s"])
              .groupBy("dist", "i", "j").agg(F.count(F.lit(1)).alias("c")))
    verified = (common
                .join(sz.select(F.col("doc_id").alias("i"),
                                F.col("n").alias("ni")), "i")
                .join(sz.select(F.col("doc_id").alias("j"),
                                F.col("n").alias("nj")), "j")
                .filter(_JDEN * F.col("c")
                        >= _JNUM * (F.col("ni") + F.col("nj") - F.col("c")))
                .groupBy("dist").agg(F.count(F.lit(1)).alias("n_verified")))
    counts = cand.groupBy("dist").agg(
        F.count(F.lit(1)).alias("n_candidates"))
    return (counts.join(verified, "dist", "left")
            .select(F.col("dist").cast("long").alias("dist"),
                    F.col("n_candidates").cast("long").alias("n_candidates"),
                    F.coalesce("n_verified", F.lit(0)).cast("long")
                    .alias("n_verified"))
            .orderBy("dist"))
