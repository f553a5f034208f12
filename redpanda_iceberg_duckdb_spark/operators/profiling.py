"""Data-quality profiling operators: a single-scan multi-column profile
(DuckDB `SUMMARIZE` analogue) and exact weighted quantiles via cumulative
windows.

Scale notes (100 TB stance):
- `profile_orders` computes every column's null count, distinct count, and
  formatted min/max in ONE aggregate pass over the fact table (Spark plans
  the multi-distinct via a single Expand + hash aggregate, still one scan);
  the 6-row unpivot happens on the single aggregated row at the driver-side
  plan, not on data.
- `weighted_median_by_type` is the scalable exact-weighted-quantile shape:
  pre-aggregate weights by (group, value) — map-side combinable — then a
  per-group cumulative-sum window over DISTINCT values only. The window
  partition is |distinct values per group|, never |rows|; this is how you
  compute exact weighted medians on a 100 TB fact without sorting the fact.

Reference parity: the reference engine exposes no profiling surface (its
verification queries are fixed aggregates, /root/reference/duckdb/
verify_iceberg.sql:4-16); additive coverage per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

# (column, formatted-min/max expression pair) — formatting is explicit per
# type so Spark and DuckDB render identical strings (double repr and
# timestamp repr differ between engines when left to implicit casts).
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "money"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _fmt_spark(col: str, kind: str, agg) -> F.Column:
    a = agg(F.col(col))
    if kind == "money":
        return F.format_string("%.2f", a)
    if kind == "ts":
        return F.date_format(a, "yyyy-MM-dd HH:mm:ss")
    return a.cast("string")


def _fmt_duck(col: str, kind: str, agg: str) -> str:
    a = f"{agg}({col})"
    if kind == "money":
        return f"printf('%.2f', {a})"
    if kind == "ts":
        return f"strftime({a}, '%Y-%m-%d %H:%M:%S')"
    return f"cast({a} as varchar)"


def _profile_oracle() -> str:
    parts = []
    for col, kind in _PROFILE_COLS:
        parts.append(f"""
SELECT '{col}' AS column_name,
       count(*) - count({col}) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       {_fmt_duck(col, kind, 'min')} AS min_value,
       {_fmt_duck(col, kind, 'max')} AS max_value
FROM orders""")
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


@register(
    "profile_orders",
    oracle=_profile_oracle(),
    tags=("profiling", "multi_distinct"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders fact — nulls / distincts / typed
    min-max per column — in a single scan. All 6×4 aggregates live in one
    agg() call; the per-column rows come from exploding a struct array built
    over the one aggregated row, so the unpivot costs nothing. The oracle
    necessarily re-states this as a UNION ALL of per-column scans (DuckDB
    SQL has no single-pass unpivot of aggregates) — same values, different
    plan, which is the point of the profile operator."""
    o = load_table(spark, sf_dir, "orders")
    aggs, structs = [], []
    for col, kind in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(col))).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__distinct"),
            _fmt_spark(col, kind, F.min).alias(f"{col}__min"),
            _fmt_spark(col, kind, F.max).alias(f"{col}__max"),
        ]
        structs.append(F.struct(
            F.lit(col).alias("column_name"),
            F.col(f"{col}__nulls").alias("n_nulls"),
            F.col(f"{col}__distinct").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_value"),
            F.col(f"{col}__max").alias("max_value")))
    return (o.agg(*aggs)
            .select(F.explode(F.array(*structs)).alias("p"))
            .select("p.column_name", "p.n_nulls", "p.n_distinct",
                    "p.min_value", "p.max_value")
            .orderBy("column_name"))


@register(
    "weighted_median_by_type",
    oracle="""
WITH g AS (
  SELECT event_type, value,
         sum(cast(json_extract(props, '$.k') as bigint)) AS w
  FROM events GROUP BY event_type, value),
c AS (
  SELECT event_type, value, w,
         sum(w) OVER (PARTITION BY event_type ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_w,
         sum(w) OVER (PARTITION BY event_type) AS tot_w
  FROM g)
SELECT event_type, min(value) AS weighted_median,
       cast(min(tot_w) AS bigint) AS total_weight
FROM c WHERE 2 * cum_w >= tot_w
GROUP BY event_type ORDER BY event_type""",
    tags=("profiling", "window", "quantile"),
)
def weighted_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of `value` per event type, weighted by the
    integer `props.k` payload: the smallest value whose cumulative weight
    reaches half the group total. Weights are pre-aggregated by
    (type, value) — map-side combinable, so the cumulative window runs over
    distinct values only, and ties are well-defined (one row per value).
    Integer weights -> the 2*cum >= tot test is exact in both engines."""
    e = load_table(spark, sf_dir, "events")
    g = (e.select("event_type", "value",
                  F.get_json_object("props", "$.k").cast("bigint").alias("k"))
         .groupBy("event_type", "value").agg(F.sum("k").alias("w")))
    wc = W.partitionBy("event_type").orderBy("value") \
          .rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.partitionBy("event_type")
    c = (g.withColumn("cum_w", F.sum("w").over(wc))
         .withColumn("tot_w", F.sum("w").over(wt)))
    return (c.filter(2 * F.col("cum_w") >= F.col("tot_w"))
            .groupBy("event_type")
            .agg(F.min("value").alias("weighted_median"),
                 F.min("tot_w").alias("total_weight"))
            .orderBy("event_type"))
