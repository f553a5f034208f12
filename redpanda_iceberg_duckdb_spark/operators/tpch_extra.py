"""Second wave of TPC-H-shaped operators: outer joins, HAVING, join+filter
revenue ratios — completing the join-type matrix (inner/semi/anti in tpch.py;
left outer, full outer here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import dmul_sum, dmul_sum_sql
from ..registry import register
from ..tables import load_table, load_tables

_DISC = ["l_extendedprice", "1 - l_discount"]


def _disc_price() -> list:
    return [F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")]


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c_custkey, any_value(c_name) AS c_name,
       {dmul_sum_sql(_DISC, "revenue")},
       any_value(n_name) AS n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= timestamp '1997-01-01 00:00:00'
  AND o_orderdate < timestamp '1997-07-01 00:00:00'
GROUP BY c_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
    tags=("tpch", "join"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue. Fact-fact shuffle on
    orderkey; customer+nation broadcast; returnflag filter pushed to scan."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp")))
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey")
        .agg(F.any_value(F.col("c_name")).alias("c_name"),
             dmul_sum(_disc_price(), "revenue"),
             F.any_value(F.col("n_name")).alias("n_name"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
    tags=("tpch", "join", "outer"),
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra join predicate (the
    classic trap: the priority filter must live in the join condition, not a
    WHERE, or customers with only urgent orders vanish), then a distribution
    over the counts. count(o_orderkey) counts non-null matches only."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey)
               & (o.o_orderpriority != "1-URGENT"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT round(100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                THEN cast(l_extendedprice AS decimal(12,2))
                     * cast(1 - l_discount AS decimal(12,2))
                ELSE cast(0 AS decimal(12,2)) END) AS double)
             / cast(sum(cast(l_extendedprice AS decimal(12,2))
                        * cast(1 - l_discount AS decimal(12,2))) AS double), 4)
           AS promo_pct,
       {dmul_sum_sql(_DISC, "total_revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
  AND l_shipdate < timestamp '1997-02-01 00:00:00'""",
    tags=("tpch", "join"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio over a broadcast part join.
    The ratio is a quotient of exact decimal sums -> cross-engine-safe round."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp")))
    disc = (F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)"))
    promo = F.when(F.col("p_type") == "PROMO", disc) \
             .otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo).cast("double")
                     / F.sum(disc).cast("double"), 4).alias("promo_pct"),
             dmul_sum(_disc_price(), "total_revenue"))
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
SELECT o_orderkey, o_orderdate,
       cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderdate
HAVING sum(cast(l_quantity AS decimal(18,2))) > 250
ORDER BY total_qty DESC, o_orderkey
LIMIT 20""",
    tags=("tpch", "aggregate", "having"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped join (post-aggregation filter —
    exact decimal comparison so the threshold cannot flip cross-engine)."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    return (
        t["orders"].join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(qty.cast("double").alias("total_qty"), qty.alias("_q"))
        .filter(F.col("_q") > 250)
        .drop("_q")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "full_outer_daily_activity",
    oracle="""
WITH p AS (SELECT cast(ts AS date) d, count(*) n_purch FROM events
           WHERE event_type = 'purchase' GROUP BY 1),
e AS (SELECT cast(ts AS date) d, count(*) n_err FROM events
      WHERE event_type = 'error' GROUP BY 1)
SELECT coalesce(p.d, e.d) AS day,
       coalesce(n_purch, 0) AS n_purchases,
       coalesce(n_err, 0) AS n_errors
FROM p FULL OUTER JOIN e ON p.d = e.d
ORDER BY day""",
    tags=("join", "outer"),
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily rollups — days with only purchases or
    only errors survive with zero-filled counts."""
    ev = load_table(spark, sf_dir, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .groupBy(F.col("ts").cast("date").alias("d"))
         .agg(F.count(F.lit(1)).alias("n_purch")))
    e = (ev.filter(F.col("event_type") == "error")
         .groupBy(F.col("ts").cast("date").alias("d2"))
         .agg(F.count(F.lit(1)).alias("n_err")))
    return (
        p.join(e, p.d == e.d2, "full_outer")
        .select(F.coalesce(p.d, e.d2).alias("day"),
                F.coalesce("n_purch", F.lit(0)).alias("n_purchases"),
                F.coalesce("n_err", F.lit(0)).alias("n_errors"))
        .orderBy("day")
    )


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, yr, {dmul_sum_sql(_DISC, "revenue")}
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             cast(year(l_shipdate) AS int) AS yr,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= timestamp '1996-01-01 00:00:00'
        AND l_shipdate < timestamp '1998-01-01 00:00:00') shipping
GROUP BY supp_nation, cust_nation, yr
ORDER BY supp_nation, cust_nation, yr""",
    tags=("tpch", "join"),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    Two broadcast joins against the same dimension (nation) under different
    roles — aliasing, not re-reading, keeps it one scan."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders",
                    "customer", "nation")
    n1 = t["nation"].select(F.col("n_nationkey").alias("nk1"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("nk2"),
                            F.col("n_name").alias("cust_nation"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    joined = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1")))
    )
    return (joined.groupBy("supp_nation", "cust_nation",
                           F.year("l_shipdate").cast("int").alias("yr"))
            .agg(dmul_sum(_disc_price(), "revenue"))
            .orderBy("supp_nation", "cust_nation", "yr"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {dmul_sum_sql(_DISC, "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
    AND l_shipdate < timestamp '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey""",
    tags=("tpch", "join", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE reused twice (revenue per supplier + its max).
    The revenue aggregate is computed once and self-compared via a scalar
    subquery; exact-decimal revenue makes the equality cross-engine-safe."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp")))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(dmul_sum(_disc_price(), "total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (revenue.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .join(F.broadcast(t["supplier"]),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@register(
    "tpch_q19_disjunctive_predicate",
    oracle=f"""
SELECT {dmul_sum_sql(_DISC, "revenue")}, count(*) AS n_matches
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)""",
    tags=("tpch", "filter", "join"),
)
def tpch_q19_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst pushes the per-side conjuncts below the join (p_brand/p_size to
    the part scan, l_quantity to lineitem) and keeps only the cross-side
    residual — the textbook disjunctive-pushdown case."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(F.broadcast(t["part"]),
                           F.col("p_partkey") == F.col("l_partkey"))
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 30))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 40))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 50))
    )
    return j.filter(cond).agg(dmul_sum(_disc_price(), "revenue"),
                              F.count(F.lit(1)).alias("n_matches"))
