"""Grid-blocked DBSCAN point labeling (Ester et al., KDD 1996) over the
2-D projection of the embedding space: classify every point core
(>= minPts eps-neighbors), border (non-core with a core eps-neighbor),
or noise. The repo's first SPATIAL-GRID join: cell width = eps, so every
eps-pair is confined to a 3x3 cell neighborhood and the neighbor search
is an EQUI-join on cell id with the probe side exploded to its 9
covering cells — the planar analogue of the LSH band trick, and the
reason this runs at 100 TB where the textbook all-pairs O(n^2) cannot.
(Full cluster assignment = these core flags + the repo's existing
connected-components iteration in clusters.py; the labeling pass is the
distributed-join heart of it.)

Exactness: coordinates are the parquet float32s widened to double; the
squared distance (dx*dx + dy*dy) has a fixed two-term addition order and
the eps^2 literal is the same `eps*eps` product in both engines — no
sqrt, no rounding anywhere; outputs are pure counts. The oracle verifies
against the brute-force all-pairs definition, proving the grid blocking
loses NOTHING."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_EPS = 0.02
_MINPTS = 4


def _oracle() -> str:
    return f"""
WITH pt AS (
  SELECT vec_id, cast(embedding[1] AS double) AS x,
         cast(embedding[2] AS double) AS y FROM embeddings),
nb AS (
  SELECT a.vec_id, count(*) AS nb
  FROM pt a JOIN pt b ON b.vec_id <> a.vec_id
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_EPS}*{_EPS}
  GROUP BY a.vec_id),
cls AS (
  SELECT p.vec_id,
         coalesce(n.nb, 0) AS nb,
         coalesce(n.nb, 0) >= {_MINPTS} AS is_core
  FROM pt p LEFT JOIN nb n ON n.vec_id = p.vec_id),
border AS (
  SELECT DISTINCT a.vec_id
  FROM pt a JOIN pt b ON b.vec_id <> a.vec_id
   AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_EPS}*{_EPS}
  JOIN cls cb ON cb.vec_id = b.vec_id AND cb.is_core
  JOIN cls ca ON ca.vec_id = a.vec_id AND NOT ca.is_core),
lab AS (
  SELECT c.vec_id, c.nb,
         CASE WHEN c.is_core THEN 'core'
              WHEN br.vec_id IS NOT NULL THEN 'border'
              ELSE 'noise' END AS point_class
  FROM cls c LEFT JOIN border br ON br.vec_id = c.vec_id)
SELECT point_class, cast(count(*) AS bigint) AS n_points,
       cast(sum(nb) AS bigint) AS neighbor_links
FROM lab GROUP BY point_class ORDER BY point_class"""


@register(
    "dbscan_grid_labels",
    oracle=_oracle(),
    tags=("clustering", "spatial", "scale-pattern"),
)
def dbscan_grid_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(point_class, n_points, neighbor_links): DBSCAN core/border/noise
    labeling at eps=0.02, minPts=4 via the 3x3 spatial-grid equi-join;
    oracle is the brute-force definition (module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pt = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"))
    cell = pt.select(
        "vec_id", "x", "y",
        F.floor(F.col("x") / _EPS).cast("long").alias("cx"),
        F.floor(F.col("y") / _EPS).cast("long").alias("cy"))
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = (cell.select(F.col("vec_id").alias("bid"),
                         F.col("x").alias("bx"), F.col("y").alias("by"),
                         "cx", "cy")
             .withColumn("o", F.explode(F.array(*[
                 F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                 for dx, dy in offsets])))
             .select("bid", "bx", "by",
                     (F.col("cx") + F.col("o.dx")).alias("cx"),
                     (F.col("cy") + F.col("o.dy")).alias("cy")))
    eps2 = F.lit(_EPS) * F.lit(_EPS)
    d2 = ((F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
          + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by")))
    edges = (cell.join(probe, ["cx", "cy"])
             .filter((F.col("bid") != F.col("vec_id")) & (d2 <= eps2))
             .select("vec_id", "bid"))
    nb = edges.groupBy("vec_id").agg(F.count(F.lit(1)).alias("nb"))
    cls = (pt.select("vec_id").join(nb, "vec_id", "left")
           .select("vec_id", F.coalesce("nb", F.lit(0)).alias("nb"))
           .withColumn("is_core", F.col("nb") >= _MINPTS))
    core_ids = cls.filter("is_core").select(F.col("vec_id").alias("bid"))
    border = (edges.join(core_ids, "bid")
              .select("vec_id").distinct()
              .join(cls.filter(~F.col("is_core")).select("vec_id"),
                    "vec_id")
              .withColumn("is_border", F.lit(True)))
    lab = (cls.join(border, "vec_id", "left")
           .select("nb", F.when(F.col("is_core"), "core")
                   .when(F.col("is_border"), "border")
                   .otherwise("noise").alias("point_class")))
    return (lab.groupBy("point_class")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.sum("nb").cast("long").alias("neighbor_links"))
            .orderBy("point_class"))
