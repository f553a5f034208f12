"""Mergeable sliding-window distinct counts — the sketch-MERGE pattern.

The point of a sketch at 100 TB is not the one-shot estimate (exact
count-distinct is one shuffle too); it is that sketch STATE is mergeable:
build tiny per-partition registers once, then answer any window/rollup by
merging registers — no second pass over the data. This operator
demonstrates that property end-to-end: per-DAY FM registers (16 buckets x
max trailing-zero run, the hll_lite_distinct structure from sketches.py)
are built in one aggregation over the events table, and every trailing
7-day estimate is produced by REGISTER-WISE MAX over the day dimension —
a RANGE-framed window over the tiny (day x bucket) register table, never
a re-scan of events. The exact trailing distinct count rides alongside
(days-grid broadcast range join; the day grid is O(days), so the join
fans each event into at most 7 window memberships) so the estimate's
error is visible per window.

Determinism: bucket assignment, run lengths, register max-merge, and the
2^R combine are exact integer arithmetic — identical cross-engine (the
sketches.py argument, inherited). A (day x 16-bucket) grid left-join
fills buckets no event hashed into on some day, so window merges see
every register position; empty-in-window registers are simply absent
from the combine (n_buckets counts live registers, as in
hll_lite_distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table
from .sketches import _M

_WIN = 7   # trailing window in days


@register(
    "hll_sliding_window_distinct",
    oracle=f"""
WITH h AS (SELECT cast(ts AS date) AS day,
                  user_id,
                  {md5_mod_duck("cast(user_id AS varchar)", _M)} AS hv
           FROM events),
daily AS (SELECT day, hv % 16 AS bucket,
                 max(CASE WHEN hv // 16 = 0 THEN 27
                          ELSE cast(floor(log2((hv // 16) & -(hv // 16)))
                               AS int) END) AS r
          FROM h GROUP BY day, hv % 16),
days AS (SELECT DISTINCT day FROM h),
grid AS (SELECT d.day, b.bucket
         FROM days d, (SELECT unnest(range(16)) AS bucket) b),
filled AS (SELECT g.day, g.bucket,
                  datediff('day', DATE '1970-01-01', g.day) AS dayn,
                  dl.r
           FROM grid g LEFT JOIN daily dl
             ON dl.day = g.day AND dl.bucket = g.bucket),
merged AS (SELECT day, bucket,
                  max(r) OVER (PARTITION BY bucket ORDER BY dayn
                               RANGE BETWEEN {_WIN - 1} PRECEDING
                                 AND CURRENT ROW) AS rm
           FROM filled),
est AS (SELECT day,
               count(rm) AS n_buckets,
               cast(sum(cast(pow(2, rm) AS bigint)) AS bigint) AS sum_pow
        FROM merged GROUP BY day),
exact AS (SELECT d.day, count(DISTINCT h.user_id) AS exact_distinct
          FROM days d JOIN h
            ON h.day BETWEEN d.day - {_WIN - 1} AND d.day
          GROUP BY d.day)
SELECT e.day,
       cast(e.n_buckets AS bigint) AS n_buckets,
       e.sum_pow,
       cast(round(16.0 * e.sum_pow / e.n_buckets / 0.77351, 0) AS bigint)
         AS hll_estimate,
       cast(x.exact_distinct AS bigint) AS exact_distinct
FROM est e JOIN exact x ON x.day = e.day
ORDER BY e.day""",
    tags=("sketch", "approx", "window", "scale-pattern"),
)
def hll_sliding_window_distinct(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Trailing {_WIN}-day distinct-user estimates from MERGED per-day FM
    registers (module docstring) next to the exact count — the mergeable
    sketch-state pattern: the events table is scanned ONCE to build
    O(days x 16) registers; every window estimate is a register-table
    window max."""
    e = load_table(spark, sf_dir, "events")
    hv = md5_mod_spark("cast(user_id AS string)", _M)
    h = e.select(F.to_date("ts").alias("day"), "user_id",
                 F.expr(hv).alias("hv"))
    daily = (h.select("day", (F.col("hv") % 16).alias("bucket"),
                      F.expr("hv div 16").alias("rest"))
             .groupBy("day", "bucket")
             .agg(F.max(F.when(F.col("rest") == 0, 27).otherwise(
                 F.floor(F.log2(F.expr("rest & -rest"))).cast("int")))
                 .alias("r")))
    days = h.select("day").distinct()
    grid = days.crossJoin(
        F.broadcast(spark.range(16).select(F.col("id").cast("long")
                                           .alias("bucket"))))
    filled = (grid.join(daily, ["day", "bucket"], "left")
              .withColumn("dayn", F.datediff("day", F.lit("1970-01-01"))))
    merged = filled.withColumn("rm", F.max("r").over(
        W.partitionBy("bucket").orderBy("dayn")
        .rangeBetween(-(_WIN - 1), 0)))
    est = (merged.groupBy("day")
           .agg(F.count("rm").alias("n_buckets"),
                F.sum(F.pow(F.lit(2.0), F.col("rm")).cast("long"))
                .alias("sum_pow")))
    exact = (F.broadcast(days.select(F.col("day").alias("wday")))
             .join(h, F.col("day").between(
                 F.date_sub(F.col("wday"), _WIN - 1), F.col("wday")))
             .groupBy("wday").agg(F.countDistinct("user_id")
                                  .alias("exact_distinct")))
    return (est.join(exact, est.day == exact.wday)
            .select(est.day,
                    F.col("n_buckets").cast("bigint").alias("n_buckets"),
                    "sum_pow",
                    F.round(16.0 * F.col("sum_pow") / F.col("n_buckets")
                            / 0.77351, 0).cast("long").alias("hll_estimate"),
                    F.col("exact_distinct").cast("bigint")
                    .alias("exact_distinct"))
            .orderBy("day"))
