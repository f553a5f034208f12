"""Distribution-shift metrics for model monitoring: PSI (population
stability index — the banking/ML-ops standard for "has my feature
drifted") between the prior and current ingest batches, and the mutual
information between two categorical columns (the dependence screen
feature selection runs before training).

Both reduce to exact integer cell counts from ONE aggregate; the only
floats are ln() of integer ratios (the established lexicon.py
cross-engine precedent) and the final weighted sums over a BOUNDED
number of cells (bins/types — ulp-order drift only, inside round(…, 6)).

PSI = sum_bins (p_i - q_i) * ln(p_i / q_i), add-0.5 smoothed cells so
empty bins stay finite (the Laplace-smoothed convention).
MI = sum_cells p_xy * ln(p_xy / (p_x p_y)), in nats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_CUT = "2000-01-01"   # prior/current batch boundary (dq_cross_batch_drift)
_NBINS = 10


def _psi_oracle() -> str:
    return f"""
WITH binned AS (
  SELECT CASE WHEN o_orderdate >= TIMESTAMP '{_CUT}' THEN 1 ELSE 0 END AS b,
         least(cast(floor(o_totalprice / 60000) AS int), {_NBINS - 1}) AS bin,
         count(*) AS c
  FROM orders GROUP BY 1, 2),
grid AS (SELECT b, i AS bin FROM (VALUES (0), (1)) t(b), range({_NBINS}) r(i)),
cells AS (SELECT g.b, g.bin, coalesce(binned.c, 0) + 0.5 AS c
          FROM grid g LEFT JOIN binned USING (b, bin)),
tots AS (SELECT b, sum(c) AS n FROM cells GROUP BY b),
probs AS (SELECT cells.bin,
                 max(CASE WHEN cells.b = 0 THEN cells.c / t.n END) AS p,
                 max(CASE WHEN cells.b = 1 THEN cells.c / t.n END) AS q
          FROM cells JOIN tots t ON t.b = cells.b GROUP BY cells.bin)
SELECT cast(count(*) AS bigint) AS n_bins,
       round(sum((q - p) * ln(q / p)), 6) AS psi
FROM probs"""


@register(
    "psi_price_drift",
    oracle=_psi_oracle(),
    tags=("quality", "drift", "evaluation", "scale-pattern"),
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_bins, psi): population stability index of the order-price
    distribution, current batch vs prior (10 fixed-width bins, add-0.5
    smoothing). <0.1 is the conventional 'stable' band; the planted-shift
    test proves a price regime change pushes it past 0.25."""
    o = load_table(spark, sf_dir, "orders")
    binned = (o.groupBy(
        (F.col("o_orderdate") >= F.lit(_CUT).cast("timestamp"))
        .cast("int").alias("b"),
        # floor, not a bare int cast: DuckDB's double->int cast ROUNDS
        # while Spark's truncates — floor() makes both engines bin alike.
        F.least(F.floor(F.col("o_totalprice") / 60000).cast("int"),
                F.lit(_NBINS - 1)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c")))
    grid = (spark.range(2).select(F.col("id").cast("int").alias("b"))
            .crossJoin(spark.range(_NBINS)
                       .select(F.col("id").cast("int").alias("bin"))))
    cells = (grid.join(binned, ["b", "bin"], "left")
             .select("b", "bin",
                     (F.coalesce(F.col("c"), F.lit(0)) + 0.5).alias("c")))
    tots = cells.groupBy("b").agg(F.sum("c").alias("n"))
    probs = (cells.join(F.broadcast(tots), "b")
             .groupBy("bin")
             .agg(F.max(F.when(F.col("b") == 0,
                               F.col("c") / F.col("n"))).alias("p"),
                  F.max(F.when(F.col("b") == 1,
                               F.col("c") / F.col("n"))).alias("q")))
    return probs.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(F.sum((F.col("q") - F.col("p"))
                      * F.log(F.col("q") / F.col("p"))), 6).alias("psi"))


def _mi_oracle() -> str:
    return """
WITH cells AS (
  SELECT event_type AS x, epoch_us(ts) // 3600000000 % 24 AS h,
         count(*) AS c
  FROM events GROUP BY 1, 2),
n AS (SELECT sum(c) AS n FROM cells),
mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY x),
mh AS (SELECT h, sum(c) AS ch FROM cells GROUP BY h)
SELECT cast((SELECT count(*) FROM cells) AS bigint) AS n_cells,
       round(sum(cast(c.c AS double) / (SELECT n FROM n)
                 * ln(cast(c.c AS double) * (SELECT n FROM n)
                      / (cast(mx.cx AS double) * mh.ch))), 6) AS mi_nats
FROM cells c JOIN mx ON mx.x = c.x JOIN mh ON mh.h = c.h"""


@register(
    "mutual_information_type_hour",
    oracle=_mi_oracle(),
    tags=("evaluation", "dependence", "scale-pattern"),
)
def mutual_information_type_hour(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """(n_cells, mi_nats): mutual information between event type and
    hour-of-day — the categorical-dependence screen, exact cell counts
    from one aggregate, MI in nats. Near 0 on the uniform fixture; the
    planted hour-type coupling test proves sensitivity."""
    e = load_table(spark, sf_dir, "events")
    cells = (e.groupBy(
        F.col("event_type").alias("x"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("h"))
        .agg(F.count(F.lit(1)).alias("c")))
    n = cells.agg(F.sum("c").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("c").alias("cx"))
    mh = cells.groupBy("h").agg(F.sum("c").alias("ch"))
    joined = (cells.join(F.broadcast(mx), "x").join(F.broadcast(mh), "h")
              .crossJoin(F.broadcast(n)))
    term = (F.col("c").cast("double") / F.col("n")
            * F.log(F.col("c").cast("double") * F.col("n")
                    / (F.col("cx").cast("double") * F.col("ch"))))
    return joined.agg(F.count(F.lit(1)).cast("long").alias("n_cells"),
                      F.round(F.sum(term), 6).alias("mi_nats"))
