"""Round-8 scale patterns, part 2: distributed stable row-id assignment
(the scalable zipWithIndex), RANGE-frame trailing windows, and exact
equi-depth binning.

Scale stances:
- stable_row_ids_two_phase: a global row_number() OVER (ORDER BY ...) is a
  single-partition sort — the canonical 100 TB anti-pattern. The two-phase
  plan: repartitionByRange on the sort key (contiguous key ranges in
  partition-id order), per-partition LOCAL ranks (window partitioned by
  the captured partition id — every partition sorts independently, in
  parallel), per-partition counts -> cumulative offsets (a window over
  #partitions rows, KBs), stable_id = offset + local rank. Total cost: one
  range exchange + one pid exchange + a broadcast — no global sort ever
  materializes on one executor. Correct because doc keys are unique and
  range partition i holds strictly-lower keys than partition i+1.
- range_frame_moving_revenue: RANGE BETWEEN frames (value-based, not
  row-count-based) — the window API surface rows-frames can't substitute
  when dates have gaps. Pre-aggregating to one row per (supplier, day)
  BEFORE the window keeps the frame scan bounded by distinct days, and
  the decimal sum keeps the trailing total exact.
- equi_depth_deciles: exact depth-10 binning via the same value-histogram
  trick as percentile_disc_exact — rank boundaries computed over DISTINCT
  values (ties stay in one bucket, so bucket membership is a pure
  function of the value), never a per-row global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_N_RANGE_PARTS = 32


@register(
    "stable_row_ids_two_phase",
    oracle="""
SELECT doc_id, source,
       row_number() OVER (ORDER BY source, doc_id) AS stable_id
FROM documents ORDER BY stable_id""",
    tags=("scale-pattern", "row-id"),
)
def stable_row_ids_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1-based stable ids in (source, doc_id) order WITHOUT a
    global single-partition sort — module docstring has the two-phase
    plan. The oracle is the naive global row_number, so a green row
    proves the distributed id assignment is exactly the sequential one."""
    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", "source")
         .repartitionByRange(_N_RANGE_PARTS, "source", "doc_id")
         .withColumn("pid", F.spark_partition_id())
         .localCheckpoint(eager=True))  # pin pids: reused by both phases
    local = d.withColumn(
        "lrank", F.row_number().over(
            W.partitionBy("pid").orderBy("source", "doc_id")))
    offsets = (d.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
               .withColumn("offset", F.coalesce(
                   F.sum("cnt").over(
                       W.orderBy("pid")
                       .rowsBetween(W.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("pid", "offset"))
    return (local.join(F.broadcast(offsets), "pid")
            .select("doc_id", "source",
                    (F.col("offset") + F.col("lrank")).alias("stable_id"))
            .orderBy("stable_id"))


@register(
    "range_frame_moving_revenue",
    oracle="""
WITH daily AS (
  SELECT l_suppkey,
         datediff('day', DATE '1970-01-01', cast(l_shipdate AS date)) AS day,
         cast(l_shipdate AS date) AS ship_date,
         sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4)))
           AS rev
  FROM lineitem GROUP BY 1, 2, 3)
SELECT l_suppkey, ship_date,
       cast(rev AS double) AS day_revenue,
       cast(sum(rev) OVER (PARTITION BY l_suppkey ORDER BY day
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS double) AS trailing_7d
FROM daily ORDER BY l_suppkey, ship_date""",
    tags=("window", "range-frame", "timeseries"),
)
def range_frame_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier 7-day TRAILING revenue via a RANGE window frame over
    the integer ship day — value-based framing, so calendar gaps shrink
    the window instead of silently widening it the way ROWS BETWEEN 6
    PRECEDING would. Daily pre-aggregation bounds the window input to
    distinct (supplier, day) pairs; decimal partials keep the trailing
    sums exact before the final double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (li.select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("day"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)").alias("rev"))
        .groupBy("l_suppkey", "day", "ship_date")
        .agg(F.sum("rev").alias("rev")))
    w = (W.partitionBy("l_suppkey").orderBy("day").rangeBetween(-6, 0))
    return (daily.select(
        "l_suppkey", "ship_date",
        F.col("rev").cast("double").alias("day_revenue"),
        F.sum("rev").over(w).cast("double").alias("trailing_7d"))
        .orderBy("l_suppkey", "ship_date"))


@register(
    "equi_depth_deciles",
    oracle="""
WITH h AS (SELECT o_totalprice v, count(*) c FROM orders GROUP BY 1),
cum AS (SELECT v, c,
               sum(c) OVER (ORDER BY v) AS cum,
               sum(c) OVER () AS n
        FROM h),
b AS (SELECT v, c,
             cast(ceil(cum * 10.0 / n) AS bigint) AS decile
      FROM cum)
SELECT decile, cast(sum(c) AS bigint) AS n_rows,
       min(v) AS lo, max(v) AS hi
FROM b GROUP BY decile ORDER BY decile""",
    tags=("statistics", "binning", "scale-pattern"),
)
def equi_depth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth decile bins of o_totalprice: bucket of a VALUE =
    ceil(cum_rank·10/n), computed on the distinct-value histogram (ties
    never straddle buckets, membership is a pure value function, and the
    only ordered pass runs over distinct values, not rows). The profile a
    range-partitioner or stratified sampler reads before choosing split
    points.

    The cumulative rank itself is computed TWO-PHASE (the
    stable_row_ids_two_phase pattern, value-bucketed): per-bucket count
    totals -> running offsets over the tiny bucket table, then a
    within-bucket cumulative window — so even the distinct-value pass
    never funnels into a single-partition global window."""
    o = load_table(spark, sf_dir, "orders")
    # h feeds three consumers (bucket offsets, total, within-bucket cum) —
    # checkpoint so the scan+histogram shuffle runs once, not three times.
    h = (o.groupBy(F.col("o_totalprice").alias("v"))
         .agg(F.count(F.lit(1)).alias("c"))
         .withColumn("vb", F.floor(F.col("v") / 10_000.0))
         .localCheckpoint(eager=True))
    boff = (h.groupBy("vb").agg(F.sum("c").alias("bc"))
            .withColumn("offset", F.coalesce(
                F.sum("bc").over(W.orderBy("vb")
                                 .rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0))))
    total = h.agg(F.sum("c").alias("n"))
    cum = (h.join(F.broadcast(boff.select("vb", "offset")), "vb")
           .withColumn("lcum", F.sum("c").over(
               W.partitionBy("vb").orderBy("v")))
           .withColumn("cum", F.col("offset") + F.col("lcum"))
           .crossJoin(F.broadcast(total)))
    b = cum.withColumn(
        "decile", F.ceil(F.col("cum") * 10.0 / F.col("n")).cast("bigint"))
    return (b.groupBy("decile")
            .agg(F.sum("c").cast("bigint").alias("n_rows"),
                 F.min("v").alias("lo"), F.max("v").alias("hi"))
            .orderBy("decile"))
