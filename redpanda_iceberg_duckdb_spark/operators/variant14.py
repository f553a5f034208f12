"""Spark 4 VARIANT-type surface: semi-structured props parsed ONCE into a
variant column, then typed extraction — the engine's answer to repeated
`get_json_object` string re-parsing (scalar.json_props_stats documents
that per-expression parse as the anti-pattern; VARIANT is the parse-once
typed column its docstring promises 'at scale').

parse_json / variant_get are native JVM expressions (no Python
boundary); the binary variant encoding is decoded per extraction instead
of re-tokenizing JSON text per expression, and a scan that extracts N
fields pays ONE parse. The DuckDB oracle extracts through its native
JSON path functions — same values, different engine-native encodings.

Scale stance (100 TB): one projection + one map-side-combinable
aggregate; at real scale the variant column would be MATERIALIZED at
ingest (shredded parquet) so extraction reads columnar — the query shape
here is exactly that read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_VARIANT_ORACLE = """
WITH x AS (SELECT event_type,
                  try_cast(json_extract_string(props, '$.k') AS bigint) AS k
           FROM events)
SELECT event_type,
       cast(count(*) AS bigint) AS n_events,
       cast(count(k) AS bigint) AS n_with_k,
       cast(sum(k) AS bigint) AS sum_k,
       cast(min(k) AS bigint) AS min_k,
       cast(max(k) AS bigint) AS max_k,
       cast(count(DISTINCT k) AS bigint) AS n_distinct_k
FROM x GROUP BY event_type ORDER BY event_type"""


@register(
    "variant_props_extract",
    oracle=_VARIANT_ORACLE,
    tags=("json", "variant", "scalar", "scale-pattern"),
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props -> parse_json VARIANT -> try_variant_get('$.k', 'bigint'),
    aggregated per event type (module docstring). The variant parse
    happens once in its own projection so Catalyst cannot inline it per
    extraction."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = v.select("event_type",
                 F.try_variant_get("v", "$.k", "bigint").alias("k"))
    return (k.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("k").alias("n_with_k"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.countDistinct("k").alias("n_distinct_k"))
            .orderBy("event_type"))
