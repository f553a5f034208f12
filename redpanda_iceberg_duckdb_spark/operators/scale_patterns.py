"""Scale-pattern operators: the shuffle-discipline techniques a 100 TB
deployment leans on, each expressed as a verifiable query.

- Two-phase distinct aggregation (pre-aggregate on the composite key, then
  re-aggregate) — the skew-safe replacement for COUNT(DISTINCT)'s expand.
- Dynamic min/max runtime filter before a semi-join — the manual form of
  Spark's runtime row-group pruning, for when the build side is too big to
  broadcast but its key bounds are cheap.
- Deterministic NTILE bucketing (uniqued ORDER BY so bucket edges are
  engine-independent).
- Benford first-digit profile — a one-pass data-quality screen.

Reference parity: the reference engine (see /root/reference/duckdb/
query_and_publish.py) delegates all of this to DuckDB on one node; these are
the shapes that keep the same answers correct when the data no longer fits
one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions import dsum, dsum_sql
from ..registry import register
from ..tables import load_table


@register(
    "user_concentration_by_type",
    oracle="""
WITH c AS (SELECT event_type, user_id, count(*) AS n
           FROM events GROUP BY event_type, user_id)
SELECT event_type,
       count(*) AS n_users,
       cast(sum(n) AS bigint) AS n_events,
       max(n) AS max_events_one_user,
       round(max(n) * 1.0 / sum(n), 6) AS concentration
FROM c GROUP BY event_type ORDER BY event_type""",
    tags=("scale", "skew"),
)
def user_concentration_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic via two-phase aggregation: pre-aggregate on the
    composite (event_type, user_id) key — spreading any single hot
    event_type across as many partitions as it has users — then re-aggregate
    the small per-user table by event_type alone. COUNT(DISTINCT) over a
    skewed group funnels every row of the hot group through one task; this
    shape never does, which is why it is the 100 TB form. `concentration` =
    share of the group's events owned by its single heaviest user (a true
    quotient, so round(…, 6) is midpoint-safe cross-engine)."""
    e = load_table(spark, sf_dir, "events")
    per_user = (e.groupBy("event_type", "user_id")
                .agg(F.count(F.lit(1)).alias("n")))
    return (per_user.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("n").alias("n_events"),
                 F.max("n").alias("max_events_one_user"),
                 F.round(F.max("n") / F.sum("n"), 6).alias("concentration"))
            .orderBy("event_type"))


@register(
    "range_filter_semijoin",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       {dsum_sql("o_totalprice", "total_price")}
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7500)
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    tags=("scale", "join", "runtime_filter"),
)
def range_filter_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit dynamic min/max runtime filter: compute the
    build side's key bounds (a 2-value scalar aggregate), broadcast them, and
    discard probe rows outside [lo, hi] BEFORE the join exchange. Spark's own
    runtime filters (DPP, bloom) do this automatically for partition columns;
    the manual form covers the case of a non-partition key whose build side
    is too large to broadcast — the bounds cost one tiny aggregate but can
    drop most of the probe side before it is shuffled. Semantics are exactly
    the plain semi-join (the range filter only removes rows the join would
    drop anyway), which is what the oracle checks."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.filter(F.col("c_acctbal") > 7500).select("c_custkey")
    bounds = build.agg(F.min("c_custkey").alias("lo"),
                       F.max("c_custkey").alias("hi"))
    pre = (orders.join(F.broadcast(bounds))
           .filter(F.col("o_custkey").between(F.col("lo"), F.col("hi")))
           .drop("lo", "hi"))
    matched = pre.join(build, pre.o_custkey == build.c_custkey, "left_semi")
    return (matched.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice", "total_price"))
            .orderBy("o_orderpriority"))


@register(
    "ntile_value_quartiles",
    oracle=f"""
WITH q AS (
  SELECT event_type, value,
         ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS quartile
  FROM events)
SELECT event_type, quartile, count(*) AS n,
       min(value) AS lo, max(value) AS hi,
       {dsum_sql("value", "total_value")}
FROM q GROUP BY event_type, quartile ORDER BY event_type, quartile""",
    tags=("scale", "window"),
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count NTILE(4) buckets per group with per-bucket stats. NTILE
    assigns by row position, so tied values at a bucket edge land wherever
    the sort put them — the ORDER BY therefore appends the unique event_id,
    making bucket membership a pure function of the data (engine- and
    partitioning-independent). One shuffle on event_type, per-partition sort,
    then a map-side-combinable aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    q = e.select("event_type", "value", "event_id",
                 F.ntile(4).over(w).alias("quartile"))
    return (q.groupBy("event_type", "quartile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("lo"),
                 F.max("value").alias("hi"),
                 dsum("value", "total_value"))
            .orderBy("event_type", "quartile"))


@register(
    "benford_price_digits",
    oracle="""
WITH d AS (
  SELECT substring(cast(cast(l_extendedprice AS decimal(18,2)) AS varchar),
                   1, 1) AS digit
  FROM lineitem)
SELECT digit, count(*) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM d GROUP BY digit ORDER BY digit""",
    tags=("scale", "quality"),
)
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of extended price — the Benford
    screen used to flag synthetic or corrupted numeric columns in ingest QA.
    The digit comes from the decimal(18,2) string form (prices are 2-dp
    doubles, so the cast is exact in both engines; no float log10 edge
    cases). One scan, one 9-row aggregate; the share normalization is an
    unpartitioned window over those 9 rows, not the data."""
    li = load_table(spark, sf_dir, "lineitem")
    digit = F.substring(
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string"), 1, 1)
    counts = (li.select(digit.alias("digit"))
              .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    return (counts.select(
                "digit", "n",
                F.round(F.col("n") / F.sum("n").over(W.partitionBy()), 6)
                .alias("share"))
            .orderBy("digit"))


@register(
    "keyset_pagination_orders",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 20""",
    tags=("scale", "pagination"),
)
def keyset_pagination_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 of orders sorted by (o_totalprice DESC, o_orderkey) fetched by
    KEYSET, not OFFSET: derive the page-1 cursor (last row in sort order =
    min of struct(price, -key) over the top-20 — a tiny TakeOrdered), then
    apply the seek predicate `price < cp OR (price = cp AND key > ck)` and
    TakeOrdered the next 20. OFFSET N scans and sorts N+k rows every page —
    O(N) per page, unusable deep into 100 TB; the keyset plan is two
    TakeOrderedAndProjects regardless of page depth. The oracle states the
    semantic contract with the literal OFFSET form, so the equivalence is
    what the gate checks (ties at the page boundary included)."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    page1 = (orders.select(*cols)
             .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(20))
    cur = page1.agg(
        F.min(F.struct(F.col("o_totalprice").alias("p"),
                       (-F.col("o_orderkey")).alias("nk"))).alias("c"))
    cursor = cur.select(F.col("c.p").alias("cp"),
                        (-F.col("c.nk")).alias("ck"))
    after = (orders.join(F.broadcast(cursor))
             .filter((F.col("o_totalprice") < F.col("cp"))
                     | ((F.col("o_totalprice") == F.col("cp"))
                        & (F.col("o_orderkey") > F.col("ck")))))
    return (after.select(*cols)
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(20))


@register(
    "join_cardinality_audit",
    oracle="""
WITH so AS (SELECT count(*) AS n_o, count(DISTINCT o_orderkey) AS d_o
            FROM orders),
sl AS (SELECT count(*) AS n_l, count(DISTINCT l_orderkey) AS d_l
       FROM lineitem),
act AS (SELECT count(*) AS actual
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
SELECT cast(n_o AS bigint) AS n_orders, cast(n_l AS bigint) AS n_lineitem,
       cast(d_o AS bigint) AS d_orders_keys,
       cast(d_l AS bigint) AS d_lineitem_keys,
       round(n_o * cast(n_l AS double) / greatest(d_o, d_l), 2)
           AS est_uniform,
       cast(actual AS bigint) AS actual_rows,
       round(n_o * cast(n_l AS double) / greatest(d_o, d_l) / actual, 6)
           AS est_over_actual
FROM so, sl, act""",
    tags=("scale", "optimizer"),
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-based-optimizer sanity check run before committing a join
    strategy at scale: the textbook uniform-key estimate
    |R ⋈ S| ≈ |R|·|S| / max(d_R, d_S) against the TRUE join cardinality
    for orders ⋈ lineitem. est/actual near 1 validates broadcast/shuffle
    sizing decisions taken from catalog stats; a large ratio means key
    skew and forecasts exactly the AQE-skew/salting regime (skewed.py).
    Three scans and one join, all single-row outputs — the estimate side
    costs two count-distinct aggregates, which is what an ANALYZE TABLE
    sweep materializes once and reuses across every plan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    so = o.agg(F.count(F.lit(1)).alias("n_o"),
               F.countDistinct("o_orderkey").alias("d_o"))
    sl = li.agg(F.count(F.lit(1)).alias("n_l"),
                F.countDistinct("l_orderkey").alias("d_l"))
    act = (o.join(li, o.o_orderkey == li.l_orderkey)
           .agg(F.count(F.lit(1)).alias("actual")))
    est = (F.col("n_o") * F.col("n_l").cast("double")
           / F.greatest("d_o", "d_l"))
    return (so.crossJoin(sl).crossJoin(act)
            .select(F.col("n_o").cast("bigint").alias("n_orders"),
                    F.col("n_l").cast("bigint").alias("n_lineitem"),
                    F.col("d_o").cast("bigint").alias("d_orders_keys"),
                    F.col("d_l").cast("bigint").alias("d_lineitem_keys"),
                    F.round(est, 2).alias("est_uniform"),
                    F.col("actual").cast("bigint").alias("actual_rows"),
                    F.round(est / F.col("actual"), 6)
                     .alias("est_over_actual")))
