"""k-center coreset selection by farthest-point traversal (Gonzalez 1985,
the 2-approximation for metric k-center) over the embeddings table — the
geometric-diversity selector beside greedy max-coverage (coverage9.py) and
MMR (retrieval9.py): pick the point farthest from everything chosen so far,
k times. The canonical use in a training-data pipeline is a small diverse
seed set / coreset whose covering radius is provably within 2x optimal.

Determinism: embeddings snap to the scaled-integer lattice (floor(x*1e4),
similarity.py convention), so every squared distance is an exact bigint
(diff <= 2e4 per dim -> diff^2 <= 4e8, x64 dims <= 2.6e10, far inside
int64) and the argmax-of-min-distance has no float ambiguity; ties break to
the smallest vec_id via a struct ordering both engines replicate.

Plan shape per round (k = 4, so 3 iterations after the seed): broadcast the
single newest center onto the distributed point scan, one zip_with/aggregate
lattice distance per point, least() against the running min-distance column,
then ONE TakeOrdered(1) scalar to the driver — the same
one-scalar-per-round discipline as k-means / PageRank-to-convergence
(quantizer_train.py, graphrank.py). Nothing quadratic ever materializes:
cost is O(k * N * d) with k and d constants.

JOB-COUNT CEILING: farthest-point traversal is inherently sequential —
one job per selected center, k jobs total. Sound for coreset-sized
k (<= ~100, where per-job driver latency dominates); for large k switch
to over-sampled batched variants (k-means|| style: sample multiple
far points per round, then reduce) instead of lengthening this loop.

Oracle: the same traversal unrolled as four chained CTEs (each "round" a
window argmin over exact integers) — structurally different SQL computing
the identical selection, per the independent-oracle bar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_K = 4
_LAT = "transform(embedding, x -> cast(floor(cast(x as double) * 1e4) as bigint))"
_D2 = ("aggregate(zip_with(ea, eb, (x, y) -> (x - y) * (x - y)), "
       "cast(0 as bigint), (acc, v) -> acc + v)")

_LAT_D = "list_transform(embedding, x -> cast(floor(cast(x as double) * 1e4) as bigint))"


def _d2_duck(e1: str, e2: str) -> str:
    return (f"cast(list_sum(list_transform(range(1, len({e1}) + 1), "
            f"i -> ({e1}[i] - {e2}[i]) * ({e1}[i] - {e2}[i]))) as bigint)")


def _oracle() -> str:
    # round j: cj = point maximizing min-dist^2 to centers {c1..c_{j-1}},
    # ties to smallest vec_id; dj = updated min-dist column.
    return f"""
WITH p AS (SELECT vec_id, {_LAT_D} AS e FROM embeddings),
c1 AS (SELECT vec_id, e FROM p ORDER BY vec_id LIMIT 1),
d1 AS (
  SELECT p.vec_id, p.e, {_d2_duck('p.e', 'c.e')} AS md
  FROM p, c1 c),
c2 AS (SELECT vec_id, e, md FROM d1 ORDER BY md DESC, vec_id LIMIT 1),
d2 AS (
  SELECT d.vec_id, d.e, least(d.md, {_d2_duck('d.e', 'c.e')}) AS md
  FROM d1 d, c2 c),
c3 AS (SELECT vec_id, e, md FROM d2 ORDER BY md DESC, vec_id LIMIT 1),
d3 AS (
  SELECT d.vec_id, d.e, least(d.md, {_d2_duck('d.e', 'c.e')}) AS md
  FROM d2 d, c3 c),
c4 AS (SELECT vec_id, e, md FROM d3 ORDER BY md DESC, vec_id LIMIT 1),
d4 AS (
  SELECT least(d.md, {_d2_duck('d.e', 'c.e')}) AS md
  FROM d3 d, c4 c)
SELECT * FROM (
  SELECT 1 AS rnk, (SELECT vec_id FROM c1) AS vec_id,
         cast(0 AS bigint) AS sel_d2
  UNION ALL
  SELECT 2, (SELECT vec_id FROM c2), (SELECT md FROM c2)
  UNION ALL
  SELECT 3, (SELECT vec_id FROM c3), (SELECT md FROM c3)
  UNION ALL
  SELECT 4, (SELECT vec_id FROM c4), (SELECT md FROM c4)
  UNION ALL
  SELECT 5, cast(-1 AS bigint), (SELECT cast(max(md) AS bigint) FROM d4)
) ORDER BY rnk"""


@register(
    "kcenter_farthest_points",
    oracle=_oracle(),
    tags=("curation", "similarity", "scale-pattern"),
)
def kcenter_farthest_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, vec_id, sel_d2): the 4 k-center seeds in selection order with
    the exact lattice min-distance^2 at which each was chosen, plus a final
    (rnk=5, vec_id=-1) row carrying the covering radius^2 of the selected
    set — farthest-point traversal, one broadcast join + one TakeOrdered(1)
    scalar per round."""
    p = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", F.expr(_LAT).alias("ea")))
    seed = p.orderBy("vec_id").limit(1).collect()[0]
    centers = [(1, int(seed.vec_id), 0)]
    # seed distances: broadcast the single seed row
    seed_df = spark.createDataFrame([(seed.ea,)], "eb0 array<bigint>")
    cur = (p.crossJoin(F.broadcast(seed_df))
           .select("vec_id", "ea",
                   F.expr(_D2.replace("eb", "eb0")).alias("md")))
    cur = cur.localCheckpoint(eager=True)
    for rnk in range(2, _K + 1):
        top = (cur.orderBy(F.desc("md"), F.asc("vec_id")).limit(1)
               .collect()[0])          # ONE scalar per round
        centers.append((rnk, int(top.vec_id), int(top.md)))
        cdf = spark.createDataFrame([(top.ea,)], "eb0 array<bigint>")
        cur = (cur.crossJoin(F.broadcast(cdf))
               .select("vec_id", "ea",
                       F.least(F.col("md"),
                               F.expr(_D2.replace("eb", "eb0")))
                       .alias("md"))
               .localCheckpoint(eager=True))
    radius = cur.agg(F.max("md")).collect()[0][0]
    centers.append((_K + 1, -1, int(radius)))
    out = spark.createDataFrame(
        centers, "rnk int, vec_id long, sel_d2 long")
    return out.orderBy("rnk")
