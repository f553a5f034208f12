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
