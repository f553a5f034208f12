"""t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the third
leg of the privacy-release trio beside k-anonymity and l-diversity
(corpus.py): a QI group can be large (k-safe) and diverse (l-safe) and
still leak if its SENSITIVE-attribute distribution sits far from the
table's — e.g. one day where almost every event is a top-band purchase.

Distance: the ordered-category Earth Mover's Distance of the paper,
EMD(P_g, P) = (1/(m-1)) * sum_j |CumP_g(j) - CumP(j)| over the m global
value bands. Every cumulative comparison cross-multiplies onto the
integer lattice (|cg_j*N - C_j*n_g|, summed per group), so the t > 1/5
exposure flag is a pure-integer predicate (5*t_scaled > n_g*N*(m-1)) and
only the reported worst_t performs one final rounded division. Sums ride
decimal(38,0): int64 headroom for n_g*N dies around N~3e9 rows, 128-bit
carries to full table scale.

Plan: one QI-band rollup (the same shuffle k-anon/l-div ride), a
group x global-band grid (groups JOIN the broadcast m-row band table —
grid is |groups| x m, linear), a per-group band-ordered window cumsum
(partitioned by group, never global), one aggregate. At 100 TB nothing
exceeds the QI rollup's exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_DEC = "decimal(38,0)"


def _oracle() -> str:
    return """
WITH b AS (
  SELECT event_type AS t,
         cast(date_trunc('day', ts) AS timestamp) AS day,
         cast(floor(value / 100.0) AS int) AS band
  FROM events),
gb AS (SELECT t, day, band, count(*) AS c FROM b GROUP BY 1, 2, 3),
grp AS (SELECT t, day, sum(c) AS n_g FROM gb GROUP BY 1, 2),
gband AS (SELECT band, count(*) AS cj FROM b GROUP BY 1),
tot AS (SELECT sum(cj) AS n, count(*) AS m FROM gband),
grid AS (
  SELECT g.t, g.day, g.n_g, gl.band, gl.cj, coalesce(x.c, 0) AS c
  FROM grp g CROSS JOIN gband gl
  LEFT JOIN gb x ON x.t = g.t AND x.day = g.day AND x.band = gl.band),
cum AS (
  SELECT t, day, n_g, band,
         sum(c)  OVER (PARTITION BY t, day ORDER BY band) AS cg,
         sum(cj) OVER (PARTITION BY t, day ORDER BY band) AS cglob
  FROM grid),
tg AS (
  SELECT c.t, c.day, c.n_g, tt.n, tt.m,
         sum(abs(cast(c.cg AS decimal(38,0)) * tt.n
                 - cast(c.cglob AS decimal(38,0)) * c.n_g)) AS t_scaled
  FROM cum c, tot tt
  WHERE c.band < (SELECT max(band) FROM gband)  -- sup over j < m: last cum diff is 0
  GROUP BY 1, 2, 3, 4, 5)
SELECT t AS event_type, cast(count(*) AS bigint) AS n_groups,
       round(max(t_scaled * 1.0
                 / (cast(n_g AS decimal(38,0)) * n * (m - 1))), 6)
           AS worst_t,
       cast(sum(CASE WHEN 5 * t_scaled
                          > cast(n_g AS decimal(38,0)) * n * (m - 1)
                THEN 1 ELSE 0 END) AS bigint) AS n_over_fifth,
       cast(sum(CASE WHEN 5 * t_scaled
                          > cast(n_g AS decimal(38,0)) * n * (m - 1)
                THEN n_g ELSE 0 END) AS bigint) AS rows_exposed
FROM tg GROUP BY 1 ORDER BY 1"""


@register(
    "t_closeness_audit",
    oracle=_oracle(),
    tags=("corpus", "privacy", "quality", "scale-pattern"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_groups, worst_t, n_over_fifth, rows_exposed):
    ordered-EMD t-closeness of each (event_type, day) QI group's value-band
    distribution vs the whole table's, with the t > 1/5 exposure flag as a
    pure-integer predicate (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(F.col("event_type").alias("t"),
                 F.date_trunc("day", "ts").alias("day"),
                 F.floor(F.col("value") / 100.0).cast("int").alias("band"))
    gb = b.groupBy("t", "day", "band").agg(F.count(F.lit(1)).alias("c"))
    grp = gb.groupBy("t", "day").agg(F.sum("c").alias("n_g"))
    glob = b.groupBy("band").agg(F.count(F.lit(1)).alias("cj"))
    tot = glob.agg(F.sum("cj").alias("n"), F.count(F.lit(1)).alias("m"),
                   F.max("band").alias("max_band"))
    grid = (grp.join(F.broadcast(glob))      # |groups| x m rows, linear
            .join(gb, ["t", "day", "band"], "left")
            .na.fill({"c": 0}))
    wc = W.partitionBy("t", "day").orderBy("band") \
        .rowsBetween(W.unboundedPreceding, 0)
    cum = (grid.withColumn("cg", F.sum("c").over(wc))
           .withColumn("cglob", F.sum("cj").over(wc)))
    tg = (cum.crossJoin(F.broadcast(tot))
          # sup over the first m-1 cumulative bins: the last diff is 0
          .where(F.col("band") < F.col("max_band"))
          .groupBy("t", "day", "n_g", "n", "m")
          .agg(F.sum(F.abs(F.col("cg").cast(_DEC) * F.col("n")
                           - F.col("cglob").cast(_DEC) * F.col("n_g")))
               .alias("t_scaled")))
    denom = F.col("n_g").cast(_DEC) * F.col("n") * (F.col("m") - 1)
    over = 5 * F.col("t_scaled") > denom
    return (tg.groupBy(F.col("t").alias("event_type"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.round(F.max(F.col("t_scaled") * 1.0 / denom), 6)
                 .alias("worst_t"),
                 F.sum(F.when(over, 1).otherwise(0)).cast("long")
                 .alias("n_over_fifth"),
                 F.sum(F.when(over, F.col("n_g")).otherwise(0))
                 .cast("long").alias("rows_exposed"))
            .orderBy("event_type"))
