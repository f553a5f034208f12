"""Market-basket mining and interval sweep-line — the transactional-pattern
closers of the analytics tier.

``basket_frequent_pairs`` is textbook Apriori (Agrawal & Srikant, VLDB 1994)
restricted to 2-itemsets, the production-relevant level: baskets are the
distinct part brands per order, frequent singletons are found first and
BROADCAST so candidate pairs are generated only among frequent items (the
a-priori downward-closure prune), and pair support is one map-side-combinable
groupBy. Association metrics (support / confidence / lift) are ratios of
exact bigint counts, rounded at 6 — both engines divide the same integers, so
the doubles agree bit-for-bit.

``max_concurrent_open_lines`` is the classic sweep-line over intervals
(order date -> ship date = the window a line item is "open"): every interval
contributes +1/-1 boundary deltas, deltas are pre-aggregated PER DATE (the
cardinality collapse: ~2,500 distinct dates regardless of row count), and the
running concurrency is cumulated with the two-phase pattern (local cumsum
within a month bucket + broadcast month offsets) — no global single-partition
sort at any scale. Peak-per-month plus the earliest date achieving the peak
falls out of one struct-max aggregate.

At 100 TB: basket pair generation is bounded by (distinct items/basket)^2
with frequent-item pruning applied BEFORE the self-join (the candidate
explosion never materializes); the sweep-line's shuffle key count equals
distinct boundary dates, not input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

# Support threshold for Apriori: a pair/item is frequent if it appears in at
# least 1/200th of all baskets (and never fewer than 5). Matches the oracle.
_SUP_DIV = 200
_TOPN = 15


def _pairs_oracle() -> str:
    return f"""
WITH basket AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
nb AS (SELECT count(DISTINCT ok) AS n FROM basket),
minsup AS (SELECT greatest(5, n // {_SUP_DIV}) AS ms, n FROM nb),
freq1 AS (
  SELECT item, count(*) AS c1 FROM basket GROUP BY 1
  HAVING count(*) >= (SELECT ms FROM minsup)),
cand AS (
  SELECT a.ok, a.item AS ia, b.item AS ib
  FROM basket a JOIN basket b ON a.ok = b.ok AND a.item < b.item
  WHERE a.item IN (SELECT item FROM freq1)
    AND b.item IN (SELECT item FROM freq1)),
freq2 AS (
  SELECT ia, ib, count(*) AS c2 FROM cand GROUP BY 1, 2
  HAVING count(*) >= (SELECT ms FROM minsup))
SELECT ia AS item_a, ib AS item_b, c2 AS support_cnt,
       round(c2 * 1.0 / (SELECT n FROM minsup), 6) AS support,
       round(c2 * 1.0 / fa.c1, 6) AS conf_a_to_b,
       round(c2 * 1.0 * (SELECT n FROM minsup) / (fa.c1 * fb.c1), 6) AS lift
FROM freq2
JOIN freq1 fa ON fa.item = ia
JOIN freq1 fb ON fb.item = ib
ORDER BY lift DESC, item_a, item_b
LIMIT {_TOPN}"""


@register(
    "basket_frequent_pairs",
    oracle=_pairs_oracle(),
    tags=("mining", "curation", "scale-pattern"),
)
def basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item_a, item_b, support_cnt, support, conf_a_to_b, lift): top-15
    frequent brand pairs across order baskets by lift — Apriori with the
    frequent-singleton prune broadcast into the candidate self-join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (li.join(F.broadcast(pt),
                      li.l_partkey == pt.p_partkey)
              .select(F.col("l_orderkey").alias("ok"),
                      F.col("p_brand").alias("item"))
              .distinct())
    nb = basket.agg(F.countDistinct("ok").alias("n"))
    n_baskets = nb.collect()[0][0]          # one driver scalar
    minsup = max(5, n_baskets // _SUP_DIV)
    freq1 = (basket.groupBy("item").agg(F.count(F.lit(1)).alias("c1"))
             .where(F.col("c1") >= minsup))
    # a-priori prune: restrict baskets to frequent items BEFORE pairing
    fb = basket.join(F.broadcast(freq1.select("item")), "item")
    a = fb.select("ok", F.col("item").alias("ia"))
    b = fb.select(F.col("ok").alias("ok2"), F.col("item").alias("ib"))
    pairs = (a.join(b, (a.ok == b.ok2) & (F.col("ia") < F.col("ib")))
             .groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("c2"))
             .where(F.col("c2") >= minsup))
    f1a = freq1.select(F.col("item").alias("ia"), F.col("c1").alias("ca"))
    f1b = freq1.select(F.col("item").alias("ib"), F.col("c1").alias("cb"))
    out = (pairs.join(F.broadcast(f1a), "ia").join(F.broadcast(f1b), "ib")
           .select(F.col("ia").alias("item_a"), F.col("ib").alias("item_b"),
                   F.col("c2").alias("support_cnt"),
                   F.round(F.col("c2") * 1.0 / n_baskets, 6).alias("support"),
                   F.round(F.col("c2") * 1.0 / F.col("ca"), 6)
                   .alias("conf_a_to_b"),
                   F.round(F.col("c2") * 1.0 * n_baskets
                           / (F.col("ca") * F.col("cb")), 6).alias("lift")))
    return (out.orderBy(F.desc("lift"), "item_a", "item_b").limit(_TOPN))


def _sweep_oracle() -> str:
    return """
WITH d AS (
  SELECT cast(o.o_orderdate AS date) AS dt, cast(1 AS bigint) AS delta
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT cast(l.l_shipdate AS date), cast(-1 AS bigint) FROM lineitem l),
nd AS (SELECT dt, sum(delta) AS nd FROM d GROUP BY 1),
run AS (
  SELECT dt, year(dt) * 100 + month(dt) AS ym,
         sum(nd) OVER (ORDER BY dt) AS open_cnt
  FROM nd),
mx AS (
  SELECT dt, ym, open_cnt,
         max(open_cnt) OVER (PARTITION BY ym) AS peak
  FROM run)
SELECT cast(ym AS bigint) AS ym, cast(peak AS bigint) AS peak_open,
       min(dt) AS peak_date
FROM mx WHERE open_cnt = peak
GROUP BY ym, peak ORDER BY ym"""


@register(
    "max_concurrent_open_lines",
    oracle=_sweep_oracle(),
    tags=("timeseries", "scale-pattern"),
)
def max_concurrent_open_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ym, peak_open, peak_date): per-month peak number of simultaneously
    open order lines (ordered, not yet shipped) and the earliest date the
    peak is reached — sweep-line with per-date delta collapse and two-phase
    (month-bucketed) cumulation, never a global single-partition sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_shipdate")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                    "o_orderdate")
    plus = (li.join(od, li.l_orderkey == od.o_orderkey)
            .select(F.to_date("o_orderdate").alias("dt"),
                    F.lit(1).cast("long").alias("delta")))
    minus = li.select(F.to_date("l_shipdate").alias("dt"),
                      F.lit(-1).cast("long").alias("delta"))
    nd = (plus.unionAll(minus)
          .groupBy("dt").agg(F.sum("delta").alias("nd"))
          .withColumn("ym", (F.year("dt") * 100 + F.month("dt"))
                      .cast("long")))
    wloc = (W.partitionBy("ym").orderBy("dt")
            .rowsBetween(W.unboundedPreceding, 0))
    local = nd.withColumn("loc", F.sum("nd").over(wloc))
    btot = nd.groupBy("ym").agg(F.sum("nd").alias("bt"))
    woff = W.orderBy("ym").rowsBetween(W.unboundedPreceding, -1)
    offs = (btot.withColumn("off",
                            F.coalesce(F.sum("bt").over(woff), F.lit(0)))
            .select("ym", "off"))
    run = (local.join(F.broadcast(offs), "ym")
           .select("ym", "dt", (F.col("loc") + F.col("off"))
                   .alias("open_cnt")))
    peak = (run.groupBy("ym")
            .agg(F.max(F.struct(
                F.col("open_cnt"),
                (-F.datediff("dt", F.lit("1970-01-01"))).alias("negd")))
                .alias("s"))
            .select("ym", F.col("s.open_cnt").alias("peak_open"),
                    F.date_add(F.lit("1970-01-01"),
                               (-F.col("s.negd")).cast("int"))
                    .alias("peak_date")))
    return peak.orderBy("ym")
