"""Deterministic epoch shuffling — the training dataloader's permutation
as a query.

A training run needs, per epoch, a reproducible pseudo-random permutation
of the corpus that (a) any worker can compute for any slice without
coordination, and (b) changes between epochs. Both fall out of a seeded
hash sort key: pos(doc, epoch) = rank of md5('ep<epoch>:'||doc_id). No
stored permutation table, no driver-side shuffle state — a worker asked
for positions [a, b) of epoch 7 derives them from the data alone.

Scale stance: ranking by the hash key is the stable_row_ids_two_phase
pattern (scale8.py), not a global row_number: repartitionByRange on the
key (the hash is uniform, so ranges are balanced BY CONSTRUCTION — this
is why shuffling by hash rank scales better than shuffling by any natural
column), per-partition local ranks in parallel, broadcast cumulative
offsets. One range exchange + one tiny broadcast per epoch. The output is
invariant to partition boundaries (offsets correct any split), so range
sampling nondeterminism cannot leak into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_EPOCHS = (1, 2)
_N_RANGE_PARTS = 32

# Efraimidis-Spirakis weighted sampling: take the top-k items by key
# u_i^(1/w_i) with u_i uniform. Transcendentals (ln, pow with fractional
# exponents) are NOT bit-identical across libm implementations, so the
# cross-engine trick: restrict weights to {1,2,3,4} and compare
# u^(L/w) with L = lcm(1..4) = 12 instead — a MONOTONE transform of
# u^(1/w) (x -> x^12 preserves order on [0,1]) whose exponents are all
# integers, computed as EXPLICIT multiplication chains (left-assoc
# products of identical IEEE doubles are deterministic everywhere).
_ES_L = 12
_ES_MAX_W = 4
_ES_K = 50
_ES_U_MOD = 1_000_000


def _u_pow_case(u: str, w: str) -> str:
    """CASE over w in 1..{_ES_MAX_W} of the explicit product u^(L/w) —
    identical SQL text on both engines."""
    arms = []
    for wv in range(1, _ES_MAX_W + 1):
        n = _ES_L // wv
        prod = " * ".join([u] * n)
        arms.append(f"WHEN {w} = {wv} THEN {prod}")
    return "CASE " + " ".join(arms) + " END"


def _oracle() -> str:
    h = md5_mod_duck(
        "'ep' || cast(e.epoch AS varchar) || ':' || cast(d.doc_id AS varchar)")
    vals = ", ".join(f"({e})" for e in _EPOCHS)
    return f"""
SELECT cast(epoch AS bigint) AS epoch, cast(pos AS bigint) AS pos, doc_id
FROM (SELECT e.epoch, d.doc_id,
             row_number() OVER (PARTITION BY e.epoch
                                ORDER BY {h}, d.doc_id) AS pos
      FROM documents d, (VALUES {vals}) e(epoch))
ORDER BY epoch, pos"""


@register(
    "epoch_shuffle_ranks",
    oracle=_oracle(),
    tags=("training", "shuffle", "scale-pattern"),
)
def epoch_shuffle_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full epoch-1 and epoch-2 permutations of the documents corpus
    (epoch, pos, doc_id) — seeded-hash order, two-phase distributed
    ranking (module docstring). The oracle is the naive global
    row_number per epoch, so a green row proves the distributed rank
    assignment equals the sequential permutation exactly — including
    that the two epochs genuinely differ (their hash keys do)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = []
    for ep in _EPOCHS:
        h = md5_mod_spark(f"concat('ep', '{ep}', ':', "
                          "cast(doc_id as string))")
        d = (docs.select("doc_id", F.expr(h).alias("h"))
             .repartitionByRange(_N_RANGE_PARTS, "h", "doc_id")
             .withColumn("pid", F.spark_partition_id())
             .localCheckpoint(eager=False))  # both phases share one pid view
        local = d.withColumn("lrank", F.row_number().over(
            W.partitionBy("pid").orderBy("h", "doc_id")))
        offsets = (d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
                   .withColumn("offset", F.coalesce(
                       F.sum("cnt").over(
                           W.orderBy("pid")
                           .rowsBetween(W.unboundedPreceding, -1)),
                       F.lit(0)))
                   .select("pid", "offset"))
        frames.append(
            local.join(F.broadcast(offsets), "pid")
            .select(F.lit(ep).cast("bigint").alias("epoch"),
                    (F.col("offset") + F.col("lrank")).cast("bigint")
                    .alias("pos"),
                    "doc_id"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("epoch", "pos")


def _ws_oracle() -> str:
    h = md5_mod_duck("'ws:' || cast(doc_id AS varchar)", _ES_U_MOD)
    key = _u_pow_case("u", "w")
    return f"""
WITH wdoc AS (
  SELECT doc_id,
         least({_ES_MAX_W}, 1 + n_chars // 500) AS w,
         ({h} + 1) / {_ES_U_MOD}.0 AS u
  FROM documents),
keyed AS (SELECT doc_id, w, {key} AS k FROM wdoc),
ranked AS (SELECT doc_id, w,
                  row_number() OVER (ORDER BY k DESC, doc_id) AS rank
           FROM keyed)
SELECT cast(rank AS bigint) AS rank, doc_id, cast(w AS bigint) AS w
FROM ranked WHERE rank <= {_ES_K} ORDER BY rank"""


@register(
    "weighted_sample_no_replacement",
    oracle=_ws_oracle(),
    tags=("training", "sampling", "scale-pattern"),
)
def weighted_sample_no_replacement(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): the top-{_ES_K} documents by key u^(1/w), where w is
    a 1..{_ES_MAX_W} length-tier weight (longer docs proportionally more
    likely) and u is a seeded md5 uniform — the quality/length-weighted
    corpus subsampling step of a training pipeline, reproducible by any
    worker from the data alone. One map pass to compute keys, one
    distributed top-k (TakeOrderedAndProject) — never a global sort of N
    rows. Cross-engine exactness comes from comparing u^(12/w) as
    explicit integer-exponent product chains (module comment): no ln, no
    pow, no transcendental anywhere."""
    h = md5_mod_spark("concat('ws:', cast(doc_id as string))", _ES_U_MOD)
    key = _u_pow_case("u", "w")
    wdoc = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.expr(f"least({_ES_MAX_W}, 1 + n_chars div 500)")
                    .alias("w"),
                    F.expr(f"({h} + 1) / {_ES_U_MOD}.0").alias("u")))
    keyed = wdoc.select("doc_id", "w", F.expr(key).alias("k"))
    top = keyed.orderBy(F.desc("k"), "doc_id").limit(_ES_K)
    ranked = top.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("k"), "doc_id")))
    return (ranked.select(F.col("rank").cast("bigint").alias("rank"),
                          "doc_id", F.col("w").cast("bigint").alias("w"))
            .orderBy("rank"))


_BLOCK = 2048   # context-length token budget per block


@register(
    "token_block_assignment",
    oracle=f"""
WITH d AS (SELECT doc_id, source,
                  array_length(string_split(text, ' ')) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY source, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS tok_off
      FROM d),
b AS (SELECT tok_off // {_BLOCK} AS block_id, doc_id, n_tokens FROM c)
SELECT cast(block_id AS bigint) AS block_id,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS tokens_started,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM b GROUP BY block_id ORDER BY block_id""",
    tags=("training", "packing", "scale-pattern"),
)
def token_block_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-then-chunk block assignment at document
    granularity: documents are laid out in (source, doc_id) order and
    each doc is assigned the {_BLOCK}-token block its global token
    OFFSET falls in. The offset is a DISTRIBUTED EXCLUSIVE PREFIX SUM —
    the stable_row_ids_two_phase pattern generalized from counts to
    sums: range-partition on the order key, per-partition local running
    sums in parallel, broadcast per-partition totals cumulated into
    offsets. A naive cumsum window is a single-partition sort (the
    oracle runs exactly that, proving the two-phase plan equals it);
    this plan's only exchanges are one range repartition and one
    O(#partitions) broadcast."""
    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "source",
                 F.size(F.split("text", " ")).alias("n_tokens"))
         .repartitionByRange(_N_RANGE_PARTS, "source", "doc_id")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=False))  # both phases share one pid view
    local = d.withColumn("lcum", F.coalesce(
        F.sum("n_tokens").over(
            W.partitionBy("pid").orderBy("source", "doc_id")
            .rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0)))
    offsets = (d.groupBy("pid").agg(F.sum("n_tokens").alias("ptotal"))
               .withColumn("poffset", F.coalesce(
                   F.sum("ptotal").over(
                       W.orderBy("pid")
                       .rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("pid", "poffset"))
    assigned = (local.join(F.broadcast(offsets), "pid")
                .select("doc_id", "n_tokens",
                        F.expr(f"(poffset + lcum) div {_BLOCK}")
                        .alias("block_id")))
    return (assigned.groupBy("block_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("tokens_started"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .select(F.col("block_id").cast("bigint").alias("block_id"),
                    "n_docs", "tokens_started", "first_doc", "last_doc")
            .orderBy("block_id"))
