"""Advanced TPC-H query shapes (Q2/Q8/Q11/Q16/Q20/Q21/Q22 analogues) over
the driver's star schema. The fixture set has no partsupp table, so shapes
that TPC-H phrases over partsupp are re-anchored on lineitem as the
part<->supplier bridge — the relational shape (what Catalyst must plan) is
preserved: correlated scalar subqueries per group, share-of-total ratios,
global-scalar thresholds, distinct-count rollups with NOT-IN exclusions,
nested semi-joins with aggregate thresholds, and multi-EXISTS order
forensics.

Scale notes (100 TB stance):
- Every dimension side (part/supplier/nation/customer slices) is broadcast;
  the only shuffles are fact-table aggregations on their natural keys.
- Correlated subqueries are written as window functions or aggregate-join
  decorrelations directly — the plan Catalyst produces for the correlated
  SQL, stated explicitly so there is no reliance on decorrelation kicking in.
- Ratios/thresholds compare doubles derived from EXACT decimal sums
  (functions.dsum/dmul_sum), so Spark and the DuckDB oracle agree bitwise.

Reference parity: the reference engine has no joins at all
(/root/reference/duckdb/query_and_publish.py:107-122 is its whole query
surface); this module is additive coverage per SURVEY.md §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions import dmul_sum, dmul_sum_sql, dsum, dsum_sql
from ..registry import register
from ..tables import load_tables

_DISC = ["l_extendedprice", "1 - l_discount"]


def _disc_price() -> list:
    return [F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")]


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH eu_supp AS (
  SELECT s_suppkey, s_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
unit AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS min_unit
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey),
ranked AS (
  SELECT p_partkey, p_name, s_name, round(min_unit, 4) AS best_unit_price,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY min_unit, l_suppkey) AS rn
  FROM unit
  JOIN part ON l_partkey = p_partkey AND p_size = 5
  JOIN eu_supp ON l_suppkey = s_suppkey)
SELECT p_partkey, p_name, s_name, best_unit_price
FROM ranked WHERE rn = 1 ORDER BY p_partkey""",
    tags=("tpch", "subquery", "window"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within one region — the
    correlated min-subquery decorrelated into an aggregate + window rank.
    lineitem is the part<->supplier bridge (no partsupp in the fixtures);
    unit price = extendedprice/quantity (exact IEEE quotient, MIN of which
    is order-independent, so cross-engine deterministic). Supplier and part
    slices broadcast; the only shuffle is the (partkey, suppkey) aggregate."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation",
                    "region")
    eu = (t["supplier"]
          .join(F.broadcast(t["nation"]),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name"))
    unit = (t["lineitem"]
            .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("min_unit")))
    ranked = (unit
              .join(F.broadcast(t["part"].filter(F.col("p_size") == 5)),
                    F.col("l_partkey") == F.col("p_partkey"))
              .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("p_partkey")
                  .orderBy("min_unit", "l_suppkey"))))
    return (ranked.filter(F.col("rn") == 1)
            .select("p_partkey", "p_name", "s_name",
                    F.round("min_unit", 4).alias("best_unit_price"))
            .orderBy("p_partkey"))


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       round(cast(sum(CASE WHEN n_name = 'NATION_7'
                  THEN cast(l_extendedprice as decimal(12,2))
                       * cast(1 - l_discount as decimal(12,2))
                  ELSE cast(0 as decimal(24,4)) END) as double)
             / cast(sum(cast(l_extendedprice as decimal(12,2))
                        * cast(1 - l_discount as decimal(12,2))) as double),
             6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY year(o_orderdate)
ORDER BY o_year""",
    tags=("tpch", "join", "share"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly revenue for one part
    type — conditional-sum / total-sum ratio in a single aggregate pass
    (no self-join). Both sums are exact decimals; the final double quotient
    is bit-equal across engines. part and supplier⋈nation broadcast; the
    orders⋈lineitem fact-fact join is the only shuffle."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "part", "supplier",
                    "nation")
    prod = (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)"))
    joined = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(
            t["supplier"].join(F.broadcast(t["nation"]),
                               F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "n_name")),
            F.col("l_suppkey") == F.col("s_suppkey")))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("n_name") == "NATION_7", prod)
                  .otherwise(F.lit(0).cast("decimal(24,4)"))).cast("double")
            / F.sum(prod).cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q11_important_value",
    oracle=f"""
WITH nv AS (
  SELECT n_name, {dsum_sql("l_extendedprice", "value")}
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name),
tot AS (SELECT {dsum_sql("l_extendedprice", "total")} FROM lineitem)
SELECT n_name, value FROM nv, tot
WHERE value > 0.05 * total
ORDER BY value DESC, n_name""",
    tags=("tpch", "subquery", "having"),
)
def tpch_q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a fraction of the GLOBAL
    total — the scalar subquery becomes a broadcast single-row cross join
    (same trick as customers_above_avg_balance). Both sides reuse one
    lineitem⋈supplier aggregate; threshold compare is exact-decimal-derived
    doubles (0.05 * x is exact binary scaling... 0.05 is not exact, but both
    engines compute the identical double product, which is what parity
    needs)."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    nv = (t["lineitem"]
          .join(F.broadcast(
              t["supplier"].join(F.broadcast(t["nation"]),
                                 F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey", "n_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
          .groupBy("n_name")
          .agg(dsum("l_extendedprice", "value")))
    tot = t["lineitem"].agg(dsum("l_extendedprice", "total"))
    return (nv.crossJoin(F.broadcast(tot))
            .filter(F.col("value") > F.lit(0.05) * F.col("total"))
            .select("n_name", "value")
            .orderBy(F.desc("value"), "n_name"))


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    tags=("tpch", "anti_join", "distinct"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute triple,
    with a NOT IN exclusion subquery (suppliers in bad standing). NOT IN
    over a key that cannot be NULL = left-anti join, stated explicitly.
    The distinct (partkey, suppkey) projection collapses lineitem first, so
    the join input is bounded by |part|x|supplier|, not |lineitem|."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    bridge = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    good_bridge = bridge.join(F.broadcast(bad),
                              F.col("l_suppkey") == F.col("s_suppkey"),
                              "left_anti")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    return (good_bridge
            .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


@register(
    "tpch_q20_part_share_suppliers",
    oracle=f"""
WITH sp AS (
  SELECT l_suppkey, l_partkey, {dsum_sql("l_quantity", "s_qty")}
  FROM lineitem GROUP BY l_suppkey, l_partkey),
pt AS (
  SELECT l_partkey, {dsum_sql("l_quantity", "p_qty")}
  FROM lineitem GROUP BY l_partkey),
dominant AS (
  SELECT DISTINCT l_suppkey FROM sp
  JOIN pt USING (l_partkey)
  WHERE s_qty > 0.15 * p_qty)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name""",
    tags=("tpch", "semi_join", "subquery"),
)
def tpch_q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate (>15% of shipped quantity)
    at least one part — a nested aggregate threshold feeding a semi-join.
    lineitem is scanned ONCE: the per-part total re-aggregates from the
    (supplier, part) partials (exact — partials stay decimal until the
    double compare), so the plan is one fact scan + two pipelined
    aggregates instead of two scans; the final IN becomes a broadcast
    left-semi join onto the supplier dimension."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    # sp feeds both the per-part rollup and the threshold join —
    # localCheckpoint the partial so the fact table is scanned once, not
    # once per consumer (and, unlike persist(), nothing stays in the
    # CacheManager after the plan is GC'd — no per-call leak).
    sp = (t["lineitem"].groupBy("l_suppkey", "l_partkey")
          .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
               .alias("s_dec"))
          .localCheckpoint(eager=True))
    pt = (sp.groupBy("l_partkey")
          .agg(F.sum("s_dec").alias("p_dec")))
    dominant = (sp.join(pt, "l_partkey")
                .filter(F.col("s_dec").cast("double")
                        > F.lit(0.15) * F.col("p_dec").cast("double"))
                .select("l_suppkey").distinct())
    return (t["supplier"]
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_name", "n_name")
            .orderBy("s_name"))


@register(
    "tpch_q21_sole_late_supplier",
    oracle="""
WITH flags AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM flags GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM flags
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10""",
    tags=("tpch", "exists", "multi_agg"),
)
def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on
    multi-supplier orders. The EXISTS / NOT EXISTS pair becomes per-order
    WINDOW aggregates (supplier count, late-supplier count over
    partitionBy(orderkey)) instead of an aggregate re-joined to itself —
    the fact side is scanned and shuffled once, not twice. 'Late' =
    shipped more than 60 days after the order date."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    flags = (
        t["lineitem"]
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(
            F.when(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                   1).otherwise(0)).alias("late")))
    w = W.partitionBy("l_orderkey")
    flagged = (flags
               .withColumn("n_supp", F.count(F.lit(1)).over(w))
               .withColumn("n_late", F.sum("late").over(w)))
    return (flagged
            .filter((F.col("late") == 1) & (F.col("n_supp") >= 2)
                    & (F.col("n_late") == 1))
            .join(F.broadcast(t["supplier"]),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(10))


@register(
    "tpch_q22_idle_rich_customers",
    oracle=f"""
WITH thr AS (
  SELECT cast(sum(cast(c_acctbal as decimal(18,2))) as double)
         / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0)
SELECT c_mktsegment,
       count(*) AS numcust,
       {dsum_sql("c_acctbal", "totacctbal")}
FROM customer, thr
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                      WHERE o_orderdate >= timestamp '2001-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment""",
    tags=("tpch", "anti_join", "subquery"),
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    RECENT orders (none since 2001-01-01 — the fixture's final year; every
    customer has some lifetime order) — global-scalar threshold (broadcast single-row cross join) + anti-join
    against the orders fact, grouped by segment. The anti-join ships only
    o_custkey (column-pruned) and aggregates it distinct-free (left_anti
    handles multiplicity)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    thr = (t["customer"].filter(F.col("c_acctbal") > 0)
           .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double") / F.count(F.lit(1))).alias("avg_bal")))
    return (t["customer"]
            .crossJoin(F.broadcast(thr))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(t["orders"]
                  .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
                  .select("o_custkey"),
                  F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dsum("c_acctbal", "totacctbal"))
            .orderBy("c_mktsegment"))


@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       cast(sum(cast(l_extendedprice as decimal(12,2))
                * (1 - cast(l_discount as decimal(12,2)))
                - cast(p_retailprice as decimal(12,2))
                  * cast(l_quantity as decimal(12,2))
                  * cast(0.6 as decimal(12,2))) as double) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC""",
    tags=("tpch", "multi_join", "agg"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year,
    /root/reference has no joins — additive per SURVEY.md §2.3): profit =
    revenue - cost, where cost re-anchors ps_supplycost (no partsupp table)
    as 60% of p_retailprice. part/supplier/nation broadcast; the only
    shuffles are the lineitem<->orders key join and the final small
    (nation, year) aggregate. The name LIKE filter prunes the broadcast
    part side BEFORE the join, so the fact scan drops non-matching rows at
    the earliest join. Exact decimal products (scale 6) summed then cast to
    double -> bit-equal across engines while |v*1e6| < 2^53."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation",
                    "orders")
    d = "decimal(12,2)"
    profit = (
        F.col("l_extendedprice").cast(d)
        * (F.lit(1) - F.col("l_discount").cast(d))
        - F.col("p_retailprice").cast(d) * F.col("l_quantity").cast(d)
        * F.lit(0.6).cast(d))
    return (t["lineitem"]
            .join(F.broadcast(t["part"]
                              .filter(F.col("p_name").like("%gear%"))
                              .select("p_partkey", "p_retailprice")),
                  F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(t["supplier"]
                              .select("s_suppkey", "s_nationkey")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(t["nation"]), 
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(t["orders"].select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(profit).cast("double").alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


@register(
    "tpch_q12_priority_shipping",
    oracle="""
SELECT l_returnflag,
       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
       cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS bigint) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= timestamp '1997-01-01'
  AND l_shipdate < timestamp '1998-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag""",
    tags=("tpch", "join", "conditional_agg"),
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classification): conditional
    counts of high/low-priority order lines per lineitem attribute within a
    ship-date year. l_shipmode/commitdate are absent from the fixtures, so
    the group key re-anchors on l_returnflag — the plan shape (fact-fact
    equi-join + CASE-bucketed counts) is identical. The date range is pushed
    to the lineitem parquet scan; both CASE branches come out of ONE
    aggregate pass (map-side partials), not two filtered scans."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (t["lineitem"]
            .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
            .select("l_orderkey", "l_returnflag")
            .join(t["orders"].select("o_orderkey", "o_orderpriority"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("l_returnflag"))


@register(
    "lateral_topk_orders",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o ON true
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c_custkey, o_totalprice DESC, o_orderkey""",
    tags=("tpch", "lateral", "topk"),
)
def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-k: each customer's 3 most expensive orders,
    written as SQL with JOIN LATERAL ... LIMIT (the per-row-subquery shape
    DuckDB users reach for). Catalyst DECORRELATES it — the physical plan is
    WindowGroupLimit (partial per-key top-k before the shuffle) feeding a
    broadcast hash join, i.e. exactly the plan you'd hand-write with a
    window; no per-customer re-execution exists at any scale. Registered
    through spark.sql to pin the SQL surface, not just the DataFrame API."""
    load_tables(spark, sf_dir, "customer", "orders")
    return spark.sql("""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")


@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= timestamp '1997-01-01'
  AND o_orderdate < timestamp '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
    tags=("tpch", "exists", "semi_join"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in one quarter that
    had at least one LATE line. The fixtures carry no l_commitdate /
    l_receiptdate, so 'late' re-anchors as shipped more than 45 days after
    the order date — which makes the EXISTS condition CORRELATED on a
    non-key column (o_orderdate), exactly the shape Catalyst must turn into
    a left-semi join with a non-equi secondary condition. The quarter
    predicate is pushed to the orders parquet scan; lineitem ships only
    (l_orderkey, l_shipdate) into the semi-join shuffle, and duplicate late
    lines per order are absorbed by the semi-join (no DISTINCT needed)."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    quarter = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    late_line = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (quarter
            .join(late_line,
                  (F.col("l_orderkey") == F.col("o_orderkey"))
                  & (F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
                  "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
SELECT round(cast(sum(cast(l_extendedprice as decimal(12,2))) as double)
             / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < 0.2 * (
    SELECT cast(sum(cast(l2.l_quantity as decimal(18,2))) as double)
           / count(*)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    tags=("tpch", "correlated_subquery", "window"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines whose quantity
    is under 20% of their part's average quantity, for one brand. The
    correlated per-part AVG decorrelates into a WINDOW aggregate over
    partitionBy(l_partkey) on the brand-filtered slice — one broadcast join
    (brand slice of part), ONE shuffle on l_partkey, one fact scan; no
    second aggregate-and-rejoin pass. Because the join keeps every lineitem
    of each surviving part, the window average equals the correlated
    subquery's per-part average exactly. avg = exact-decimal sum / count
    cast to double, so the 0.2x threshold compare is bit-equal across
    engines; the headline /7.0 is a true quotient, rounded last."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    w = W.partitionBy("l_partkey")
    sliced = (t["lineitem"]
              .join(F.broadcast(t["part"]
                                .filter(F.col("p_brand") == "Brand#2")
                                .select("p_partkey")),
                    F.col("l_partkey") == F.col("p_partkey"))
              .withColumn(
                  "avg_qty",
                  F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w)
                  .cast("double") / F.count(F.lit(1)).over(w)))
    return (sliced
            .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
            .agg(F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                .cast("double") / F.lit(7.0), 2).alias("avg_yearly")))
