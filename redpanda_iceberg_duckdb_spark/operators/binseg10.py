"""Binary segmentation of the hourly event series (Scott & Knott 1974;
the classic hierarchical change-point method, the multi-break sibling of
the single CUSUM detector in changepoint.py): find the best mean-shift
split of the series, then the best split of each half — up to three
breaks, each accepted only if it strictly reduces SSE.

Exactness: for a segment [a, b] (prefix sums S), the SSE reduction of a
split at k is (S1*n2 - S2*n1)^2 / (n1*n2*(b-a+1)) — so the ARGMAX needs
no division at all: candidate k beats j iff A_k^2 * B_j > A_j^2 * B_k
with A the cross-term and B = n1*n2 (the segment-length factor is
constant within a level). The argmax is a NOT-EXISTS/anti-join over the
HOURS frame (a few hundred rows at any SF — candidates^2 comparisons on
an aggregate-sized frame, never on data), products ride decimal(38,0),
and "accept the split" is the pure-integer predicate A != 0. Ties break
to the earliest hour in both engines.

Plan: the only data-sized cost is the hourly rollup scan; everything
after lives on the hours frame (one cumulative window + three bounded
anti-join argmaxes, whose <= 3 split positions are bounded driver
scalars, the kcenter discipline). Output: the final segments with their
bounds and exact totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_DEC = "decimal(38,0)"


def _oracle() -> str:
    # better(j, k): j's gain strictly exceeds k's, or ties at a smaller rn.
    better = ("cast(j.a AS decimal(38,0)) * j.a * k.b "
              "> cast(k.a AS decimal(38,0)) * k.a * j.b "
              "OR (cast(j.a AS decimal(38,0)) * j.a * k.b "
              "= cast(k.a AS decimal(38,0)) * k.a * j.b AND j.rn < k.rn)")
    return f"""
WITH h AS (
  SELECT cast(date_trunc('hour', ts) AS timestamp) AS hr,
         cast(count(*) AS bigint) AS y
  FROM events GROUP BY 1),
r AS (
  SELECT hr, y, row_number() OVER (ORDER BY hr) AS rn,
         sum(y) OVER (ORDER BY hr) AS s
  FROM h),
tot AS (SELECT max(rn) AS n, max(s) AS sn FROM r),
c1 AS (
  SELECT rn, hr, s * (t.n - rn) - (t.sn - s) * rn AS a,
         rn * (t.n - rn) AS b
  FROM r, tot t WHERE rn < t.n),
b1 AS (
  SELECT k.rn FROM c1 k
  WHERE k.a <> 0 AND NOT EXISTS (SELECT 1 FROM c1 j WHERE {better})),
c2 AS (
  SELECT r.rn, r.hr,
         CASE WHEN r.rn <= b1.rn THEN 0 ELSE 1 END AS side,
         CASE WHEN r.rn <= b1.rn
              THEN (r.s) * (b1.rn - r.rn)
                   - ((SELECT s FROM r x WHERE x.rn = b1.rn) - r.s) * r.rn
              ELSE (r.s - (SELECT s FROM r x WHERE x.rn = b1.rn))
                       * (t.n - r.rn)
                   - (t.sn - r.s) * (r.rn - b1.rn) END AS a,
         CASE WHEN r.rn <= b1.rn
              THEN r.rn * (b1.rn - r.rn)
              ELSE (r.rn - b1.rn) * (t.n - r.rn) END AS b
  FROM r, tot t, b1
  WHERE r.rn <> b1.rn AND r.rn < t.n),
b2 AS (
  SELECT k.rn FROM c2 k
  WHERE k.a <> 0 AND NOT EXISTS (
    SELECT 1 FROM c2 j WHERE j.side = k.side AND ({better}))),
splits AS (SELECT rn FROM b1 UNION ALL SELECT rn FROM b2),
seg AS (
  SELECT r.rn, r.hr, r.y,
         1 + (SELECT count(*) FROM splits s WHERE s.rn < r.rn) AS seg_id
  FROM r)
SELECT cast(row_number() OVER (ORDER BY min(hr)) AS int) AS seg,
       min(hr) AS start_hour, max(hr) AS end_hour,
       cast(count(*) AS bigint) AS n_hours,
       cast(sum(y) AS bigint) AS total_events
FROM seg GROUP BY seg_id ORDER BY start_hour"""


@register(
    "binary_segmentation_splits",
    oracle=_oracle(),
    tags=("timeseries", "changepoint", "scale-pattern"),
)
def binary_segmentation_splits(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """(seg, start_hour, end_hour, n_hours, total_events): up to four
    mean-shift segments of the hourly event-count series from depth-2
    binary segmentation — division-free exact argmax per level, splits
    accepted only when the SSE strictly drops (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    h = (e.groupBy(F.date_trunc("hour", "ts").alias("hr"))
         .agg(F.count(F.lit(1)).cast("long").alias("y")))
    wh = W.orderBy("hr")                         # hours-sized frame
    r = (h.withColumn("rn", F.row_number().over(wh))
         .withColumn("s", F.sum("y").over(
             wh.rowsBetween(W.unboundedPreceding, 0)))
         .localCheckpoint())                     # reused by every level
    n, sn = r.agg(F.max("rn"), F.max("s")).collect()[0]

    def argmax_split(cand: DataFrame) -> list:
        """Rows (rn, side, a, b) -> winning rn per side via anti-join;
        result is <= 2 bounded driver scalars (kcenter discipline)."""
        k = cand.alias("k")
        j = cand.alias("j")
        ka, kb = F.col("k.a").cast(_DEC), F.col("k.b").cast(_DEC)
        ja, jb = F.col("j.a").cast(_DEC), F.col("j.b").cast(_DEC)
        beats = (ja * ja * kb > ka * ka * jb) | \
            ((ja * ja * kb == ka * ka * jb)
             & (F.col("j.rn") < F.col("k.rn")))
        return (k.filter(F.col("k.a") != 0)
                .join(j, (F.col("j.side") == F.col("k.side")) & beats,
                      "left_anti")
                .select(F.col("k.rn")).collect())

    c1 = (r.where(F.col("rn") < n)
          .select("rn", F.lit(0).alias("side"),
                  (F.col("s") * (n - F.col("rn"))
                   - (sn - F.col("s")) * F.col("rn")).alias("a"),
                  (F.col("rn") * (n - F.col("rn"))).alias("b")))
    top = argmax_split(c1)
    splits = [int(row.rn) for row in top]
    if splits:
        rn1 = splits[0]
        s1 = r.where(F.col("rn") == rn1).select("s").collect()[0][0]
        left = (r.where((F.col("rn") < rn1))
                .select("rn", F.lit(0).alias("side"),
                        (F.col("s") * (rn1 - F.col("rn"))
                         - (s1 - F.col("s")) * F.col("rn")).alias("a"),
                        (F.col("rn") * (rn1 - F.col("rn"))).alias("b")))
        right = (r.where((F.col("rn") > rn1) & (F.col("rn") < n))
                 .select("rn", F.lit(1).alias("side"),
                         ((F.col("s") - s1) * (n - F.col("rn"))
                          - (sn - F.col("s"))
                          * (F.col("rn") - rn1)).alias("a"),
                         ((F.col("rn") - rn1)
                          * (n - F.col("rn"))).alias("b")))
        splits += [int(row.rn) for row in argmax_split(left.union(right))]
    cond = F.lit(1)
    for p in splits:
        cond = cond + F.when(F.col("rn") > p, 1).otherwise(0)
    seg = r.withColumn("seg_id", cond)
    ws = W.orderBy("start_hour")
    return (seg.groupBy("seg_id")
            .agg(F.min("hr").alias("start_hour"),
                 F.max("hr").alias("end_hour"),
                 F.count(F.lit(1)).cast("long").alias("n_hours"),
                 F.sum("y").cast("long").alias("total_events"))
            .withColumn("seg", F.row_number().over(ws).cast("int"))
            .select("seg", "start_hour", "end_hour", "n_hours",
                    "total_events")
            .orderBy("start_hour"))
