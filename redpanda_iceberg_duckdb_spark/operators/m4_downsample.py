"""M4 time-series downsampling (Jugel et al., VLDB 2014) — the exact
width-bounded reduction a 100 TB metrics store runs before any chart,
anomaly thumbnail, or drift dashboard touches the data.

M4 splits each series' time range into W uniform pixel-column buckets and
keeps, per bucket, the FIRST, LAST, MIN-value, and MAX-value points — the
provably sufficient set for error-free line rendering at width W. Output
is dimension-bounded (series x W x 4 values) regardless of input size, so
it is the canonical "massive in, tiny out" aggregation.

Scale stance: ONE map-side-combinable hash aggregate. Each of the four
roles is a lexicographic ``min``/``max`` over a struct (Spark structs and
DuckDB ROWs both order lexicographically — field ORDER is therefore part
of the cross-engine contract and kept identical on both sides), so the
whole reduction is partial-aggregatable: every partition emits at most
W x #series structs and the shuffle carries only those — no window, no
sort, no per-series repartition. Bucket bounds come from a per-series
min/max aggregate (#series rows) broadcast back onto the scan; at 100 TB
the bounds of a time-partitioned table come from partition metadata
instead and the scan stays single-pass. Tie-breaks are total
((ts, event_id) for first/last, (value, ts, event_id) for min/max), so
the selected points are unique and engine-independent.

Reference parity: the reference's analytics pipeline serves per-symbol
trade series out of DuckDB (/root/reference/duckdb/query_and_publish.py
summary queries); M4 is the scale-correct version of "show me the
series", reduced in-engine instead of shipping raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_W = 48  # pixel-column buckets per series


def _oracle() -> str:
    # Struct field order matters: {'u','e','v'} compares (us, event_id)
    # first — identical to the Spark struct below.
    return f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS us, value, event_id FROM events),
bounds AS (
  SELECT event_type, min(us) AS mn, max(us) AS mx
  FROM pts GROUP BY event_type),
bucketed AS (
  SELECT p.event_type,
         least({_W - 1}, ((p.us - b.mn) * {_W}) // (b.mx - b.mn + 1))
           AS bucket,
         p.us, p.value, p.event_id
  FROM pts p JOIN bounds b USING (event_type))
SELECT event_type, cast(bucket AS bigint) AS bucket,
       (min({{'u': us, 'e': event_id, 'v': value}})).u AS t_first_us,
       (min({{'u': us, 'e': event_id, 'v': value}})).v AS v_first,
       (min({{'v': value, 'u': us, 'e': event_id}})).u AS t_min_us,
       (min({{'v': value, 'u': us, 'e': event_id}})).v AS v_min,
       (max({{'v': value, 'u': us, 'e': event_id}})).u AS t_max_us,
       (max({{'v': value, 'u': us, 'e': event_id}})).v AS v_max,
       (max({{'u': us, 'e': event_id, 'v': value}})).u AS t_last_us,
       (max({{'u': us, 'e': event_id, 'v': value}})).v AS v_last
FROM bucketed
GROUP BY event_type, bucket
ORDER BY event_type, bucket"""


@register(
    "m4_downsample_events",
    oracle=_oracle(),
    tags=("timeseries", "downsample", "scale-pattern"),
)
def m4_downsample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, bucket) the four M4 points over ``events.value``:
    first/last by (ts, event_id), min/max by (value, ts, event_id).
    Timestamps surface as epoch microseconds so both engines compare
    integers. The oracle recomputes the identical reduction in SQL, so a
    green row proves bucket assignment (integer µs arithmetic) and all
    four lexicographic struct selections agree point-for-point."""
    pts = (load_table(spark, sf_dir, "events")
           .select("event_type", F.unix_micros("ts").alias("us"),
                   "value", "event_id"))
    bounds = pts.groupBy("event_type").agg(
        F.min("us").alias("mn"), F.max("us").alias("mx"))
    b = (pts.join(F.broadcast(bounds), "event_type")
         .withColumn(
             "bucket",
             F.least(F.lit(_W - 1).cast("long"),
                     F.expr(f"((us - mn) * {_W}) div (mx - mn + 1)"))))
    firstlast = F.struct(F.col("us").alias("u"),
                         F.col("event_id").alias("e"),
                         F.col("value").alias("v"))
    minmax = F.struct(F.col("value").alias("v"), F.col("us").alias("u"),
                      F.col("event_id").alias("e"))
    return (b.groupBy("event_type", "bucket")
            .agg(F.min(firstlast).alias("fs"), F.max(firstlast).alias("ls"),
                 F.min(minmax).alias("ms"), F.max(minmax).alias("xs"))
            .select("event_type", F.col("bucket").cast("long").alias("bucket"),
                    F.col("fs.u").alias("t_first_us"),
                    F.col("fs.v").alias("v_first"),
                    F.col("ms.u").alias("t_min_us"),
                    F.col("ms.v").alias("v_min"),
                    F.col("xs.u").alias("t_max_us"),
                    F.col("xs.v").alias("v_max"),
                    F.col("ls.u").alias("t_last_us"),
                    F.col("ls.v").alias("v_last"))
            .orderBy("event_type", "bucket"))
