"""The hashing trick (feature hashing, Weinberger et al. 2009): project an
unbounded vocabulary into a fixed 2^k feature space with a hash function
instead of a dictionary. At 100 TB this is THE way to featurize text — a
dictionary build is a global distinct + dense-rank (a synchronization
point and a 100M-row broadcast); a hash is a map-side expression with zero
coordination. The price is collisions; this audit MEASURES that price:
the bucket-load histogram over the corpus vocabulary (load 1 = collision-
free, load >= 2 = features that alias each other).

Both engines share the identical md5-derived 64-bit hash
(functions.hashing: Spark conv-on-md5-tail == DuckDB md5_number_lower), so
bucket assignment — and therefore the whole histogram — is bit-equal.

Scale stance: one distinct over tokens (map-side combine on the exploded
stream), one map-side hash expression, two small groupBys. Nothing is
driver-side; the histogram output is O(max load) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_N_BUCKETS = 512

_FH_ORACLE = f"""
WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
              FROM documents),
b AS (SELECT {md5_mod_duck('tok', _N_BUCKETS)} AS bucket,
             cast(count(*) AS bigint) AS load
      FROM toks WHERE tok <> '' GROUP BY 1)
SELECT load AS bucket_load,
       cast(count(*) AS bigint) AS n_buckets,
       cast(sum(load) AS bigint) AS n_tokens,
       cast(sum(load - 1) AS bigint) AS n_aliased
FROM b GROUP BY 1 ORDER BY 1"""


@register(
    "feature_hashing_collisions",
    oracle=_FH_ORACLE,
    tags=("features", "hashing", "scale-pattern"),
)
def feature_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-load histogram of the corpus vocabulary hashed into
    {_N_BUCKETS} features: per load level, how many buckets carry it, how
    many tokens they hold, and how many tokens are aliased (collide with a
    lower-id sibling). Module docstring has the dictionary-vs-hash scale
    rationale."""
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .filter(F.col("tok") != "").distinct())
    b = (toks.select(F.expr(md5_mod_spark("tok", _N_BUCKETS)).alias("bucket"))
         .groupBy("bucket")
         .agg(F.count(F.lit(1)).cast("long").alias("load")))
    return (b.groupBy(F.col("load").alias("bucket_load"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_buckets"),
                 F.sum("load").cast("long").alias("n_tokens"),
                 F.sum(F.col("load") - 1).cast("long").alias("n_aliased"))
            .orderBy("bucket_load"))
