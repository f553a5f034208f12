"""Scalar-function and subquery operators: JSON extraction, date-part
rollups, LIKE-filtered scans, ranking functions, correlated subqueries, and
approximate aggregates. Rounds out the function surface of SURVEY.md section 2.8
plus the subquery shapes Catalyst decorrelates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions import dsum, dsum_sql
from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table, load_tables


@register(
    "json_props_stats",
    oracle="""
SELECT event_type,
       count(json_extract(props, '$.k')) AS n_with_k,
       cast(sum(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint)
           AS sum_k,
       cast(min(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint)
           AS min_k,
       cast(max(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint)
           AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type""",
    tags=("scalar", "json"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column: extract $.k from props (string-typed
    JSON, the lake-common pattern) and aggregate. get_json_object stays
    JVM-side; at scale, parse once into a typed column, not per-expression."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(F.count(k).alias("n_with_k"),
             F.sum(k).alias("sum_k"),
             F.min(k).alias("min_k"),
             F.max(k).alias("max_k"))
        .orderBy("event_type")
    )


@register(
    "orders_by_month",
    oracle="""
SELECT cast(year(o_orderdate) AS int) AS yr,
       cast(month(o_orderdate) AS int) AS mo,
       count(*) AS n_orders,
       cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
FROM orders
GROUP BY yr, mo
ORDER BY yr, mo""",
    tags=("scalar", "time"),
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part rollup (year/month extraction)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"),
                  F.month("o_orderdate").alias("mo"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("total"))
        .orderBy("yr", "mo")
    )


@register(
    "parts_like_filter",
    oracle="""
SELECT p_brand, count(*) AS n_parts,
       count(DISTINCT p_type) AS n_types
FROM part
WHERE p_type LIKE '%a%' AND p_name NOT LIKE '%zz%' AND p_size >= 10
GROUP BY p_brand
ORDER BY p_brand""",
    tags=("scalar", "filter"),
)
def parts_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE predicates with a range filter — string predicates
    push down to the scan as startswith/contains where possible."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%a%")
                 & ~F.col("p_name").like("%zz%")
                 & (F.col("p_size") >= 10))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.countDistinct("p_type").alias("n_types"))
        .orderBy("p_brand")
    )


@register(
    "window_rank_functions",
    oracle="""
SELECT event_type, event_id,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       first_value(event_id) OVER w AS first_id,
       nth_value(event_id, 2) OVER w AS second_id
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
QUALIFY rank() OVER w <= 20
ORDER BY event_type, rnk, event_id""",
    tags=("scalar", "window"),
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family (rank / dense_rank / ntile / first_value /
    nth_value) over a totally ordered frame; top-20 per type."""
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    wo = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.select(
            "event_type", "event_id",
            F.rank().over(wo).alias("rnk"),
            F.dense_rank().over(wo).alias("drnk"),
            F.ntile(4).over(wo).alias("quartile"),
            F.first("event_id").over(w).alias("first_id"),
            F.nth_value("event_id", 2).over(w).alias("second_id"),
        )
        .filter(F.col("rnk") <= 20)
        .orderBy("event_type", "rnk", "event_id")
    )


@register(
    "customers_above_avg_balance",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers,
       round(cast(sum(cast(c_acctbal AS decimal(18,2))) AS double)
             / count(c_acctbal), 2) AS avg_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
GROUP BY c_mktsegment
ORDER BY c_mktsegment""",
    tags=("scalar", "subquery"),
)
def customers_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (TPC-H Q22 shape) —
    Catalyst evaluates the subquery once and broadcasts the scalar.
    avg() compares in double on both engines: the threshold is a strict
    inequality against a quotient, cross-engine-safe for this data."""
    load_table(spark, sf_dir, "customer")
    return spark.sql("""
SELECT c_mktsegment, count(*) AS n_customers,
       round(cast(sum(cast(c_acctbal AS decimal(18,2))) AS double)
             / count(c_acctbal), 2) AS avg_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
GROUP BY c_mktsegment
ORDER BY c_mktsegment""")


@register(
    "small_quantity_parts",
    oracle="""
SELECT count(*) AS n_small,
       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS revenue
FROM lineitem l1
WHERE l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l1.l_partkey)""",
    tags=("scalar", "subquery"),
)
def small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): per-part average
    quantity threshold. Catalyst decorrelates this into an aggregate + join —
    the plan a hand-written two-pass pipeline would produce.

    Cross-engine note: the 0.5*avg threshold is a double quotient compared
    strictly; quantities are integers, so a tie would need the quotient to be
    exactly 2*quantity — measure-zero for real data, verified by the oracle
    gate."""
    load_table(spark, sf_dir, "lineitem")
    return spark.sql("""
SELECT count(*) AS n_small,
       cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS revenue
FROM lineitem l1
WHERE l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l1.l_partkey)""")


@register(
    "approx_aggregates",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       true AS users_within_10pct,
       true AS p50_rank_ok,
       true AS p99_rank_ok
FROM events GROUP BY event_type ORDER BY event_type""",
    tags=("scalar", "approx"),
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, approximate quantiles) — the
    100 TB default where exactness isn't required. Sketch values differ
    across engines by design, so the cross-engine contract is a TOLERANCE
    check, made deterministic: the output carries the exact distinct count
    (hash-anchored) plus booleans asserting the sketch landed within bounds
    — approx_count_distinct within 10% of exact (default rsd = 5%), and each
    approx percentile at a data rank within its guarantee band
    (percentile_approx default accuracy 10000 -> rank error <= 0.01%). The
    oracle emits literal ``true`` flags, so any out-of-tolerance sketch
    flips a boolean and fails the hash gate."""
    e = load_table(spark, sf_dir, "events")
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("au"),
        F.percentile_approx("value", 0.5).alias("p50"),
        F.percentile_approx("value", 0.99).alias("p99"))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"))
    ranks = (
        e.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg((F.sum(F.when(F.col("value") <= F.col("p50"), 1).otherwise(0))
              / F.count(F.lit(1))).alias("f50"),
             (F.sum(F.when(F.col("value") <= F.col("p99"), 1).otherwise(0))
              / F.count(F.lit(1))).alias("f99")))
    return (
        exact.join(F.broadcast(approx), "event_type")
        .join(F.broadcast(ranks), "event_type")
        .select(
            "event_type", "exact_users",
            (F.abs(F.col("au") - F.col("exact_users"))
             / F.col("exact_users") <= 0.1).alias("users_within_10pct"),
            F.col("f50").between(0.45, 0.55).alias("p50_rank_ok"),
            F.col("f99").between(0.985, 1.0).alias("p99_rank_ok"))
        .orderBy("event_type")
    )


@register(
    "interval_join_purchase_signup",
    oracle="""
SELECT p.user_id, p.event_id AS purchase_id, s.event_id AS signup_id,
       p.ts AS p_ts, s.ts AS s_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id
 AND s.ts <= p.ts
 AND s.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY purchase_id, signup_id""",
    tags=("scalar", "join", "interval"),
)
def interval_join_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: purchases x same-user signups within a 1-hour
    look-back. Catalyst executes this as an equi-join on user_id with the
    range as residual condition — linear, not the O(n^2) a pure range join
    would be. Streaming twin: streaming/joins.py (same predicate +
    watermark-bounded state)."""
    e = load_table(spark, sf_dir, "events")
    p = (e.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id"), F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    s = (e.filter(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("s_user"),
                 F.col("event_id").alias("signup_id"),
                 F.col("ts").alias("s_ts")))
    return (p.join(s, (F.col("user_id") == F.col("s_user"))
                   & (F.col("s_ts") <= F.col("p_ts"))
                   & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")))
            .select("user_id", "purchase_id", "signup_id", "p_ts", "s_ts")
            .orderBy("purchase_id", "signup_id"))


@register(
    "deterministic_sample_stats",
    oracle=f"""
SELECT event_type, count(*) AS n_sampled,
       {dsum_sql("value", "sampled_value")}
FROM events
WHERE {md5_mod_duck("cast(event_id AS varchar)", 100)} < 5
GROUP BY event_type
ORDER BY event_type""",
    tags=("scalar", "sampling"),
)
def deterministic_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 5% sample via content hashing (md5(event_id) mod 100 < 5)
    — unlike rand()/TABLESAMPLE, the same rows are selected on every engine,
    every run, every partitioning. The pattern for auditable pipeline
    sampling at scale."""
    e = load_table(spark, sf_dir, "events")
    keep = F.expr(md5_mod_spark("cast(event_id AS string)", 100)) < 5
    return (e.filter(keep)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 dsum("value", "sampled_value"))
            .orderBy("event_type"))


@register(
    "heavy_hitters_users",
    oracle="""
WITH per_user AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
tot AS (SELECT cast(sum(n) AS bigint) AS total FROM per_user)
SELECT user_id, n,
       round(n * 1.0 / total, 6) AS share
FROM per_user, tot
ORDER BY n DESC, user_id
LIMIT 10""",
    tags=("scalar", "skew"),
)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: top-10 heaviest keys with their share of all
    rows — the pre-flight check before choosing salting/AQE strategies for a
    key (functions/skew.py consumes exactly this kind of hot-key list)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    total = per_user.agg(F.sum("n").alias("total"))
    return (per_user.crossJoin(F.broadcast(total))
            .select("user_id", "n",
                    F.round(F.col("n") / F.col("total"), 6).alias("share"))
            .orderBy(F.desc("n"), F.asc("user_id"))
            .limit(10))


@register(
    "utf8_byte_audit",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       cast(sum(strlen(text)) AS bigint) AS n_utf8_bytes,
       cast(sum(length(text)) AS bigint) AS n_chars,
       cast(sum(CASE WHEN strlen(text) > length(text) THEN 1 ELSE 0 END)
            AS bigint) AS n_multibyte_docs,
       cast(sum(CASE WHEN decode(encode(text)) = text THEN 1 ELSE 0 END)
            AS bigint) AS n_roundtrip_ok
FROM documents GROUP BY source ORDER BY source""",
    tags=("scalar", "encoding"),
)
def utf8_byte_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 F6 (UTF-8 encode/decode) as a driver-checkable query:
    per source, UTF-8 byte vs codepoint totals, multibyte-document count,
    and an encode->decode roundtrip identity check — the wire-size/charset
    audit the Kafka payload path (sources/kafka.py encode_keyed_json)
    relies on. Single scan, one aggregate; encode/decode run JVM-side per
    row, no shuffle beyond the per-source rollup."""
    d = load_table(spark, sf_dir, "documents")
    enc = F.encode("text", "UTF-8")
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.octet_length("text")).alias("n_utf8_bytes"),
                 F.sum(F.length("text")).alias("n_chars"),
                 F.sum(F.when(F.octet_length("text") > F.length("text"), 1)
                       .otherwise(0)).alias("n_multibyte_docs"),
                 F.sum(F.when(F.decode(enc, "UTF-8") == F.col("text"), 1)
                       .otherwise(0)).alias("n_roundtrip_ok"))
            .orderBy("source"))


# UUIDv4-from-int bit layout (SURVEY §2.8 F8): 32 lowercase hex chars of the
# 128-bit integer, version nibble (char 13) forced to '4', variant nibble
# (char 17) forced to (n & 3) | 8 — exactly what Python's
# uuid.UUID(int=i, version=4) does (generator.py:44). The nibble remap uses
# a hex-char table lookup so both engines share one construction.
_HEXTAB = "0123456789abcdef"


def _uuid_from_int_spark(col: str) -> str:
    h = f"lower(lpad(hex({col}), 32, '0'))"
    vn = (f"substr('{_HEXTAB}', "
          f"((instr('{_HEXTAB}', substr({h}, 17, 1)) - 1) % 4) + 9, 1)")
    return (f"concat(substr({h}, 1, 8), '-', substr({h}, 9, 4), '-4', "
            f"substr({h}, 14, 3), '-', {vn}, substr({h}, 18, 3), '-', "
            f"substr({h}, 21, 12))")


def _uuid_from_int_duck(col: str) -> str:
    h = f"printf('%032x', {col})"
    vn = (f"substr('{_HEXTAB}', "
          f"((strpos('{_HEXTAB}', substr({h}, 17, 1)) - 1) % 4) + 9, 1)")
    return (f"substr({h}, 1, 8) || '-' || substr({h}, 9, 4) || '-4' || "
            f"substr({h}, 14, 3) || '-' || {vn} || substr({h}, 18, 3) || "
            f"'-' || substr({h}, 21, 12)")


@register(
    "uuid_from_int_audit",
    oracle=f"""
WITH u AS (SELECT event_type, {_uuid_from_int_duck('event_id')} AS uid
           FROM events)
SELECT event_type,
       count(*) AS n,
       count(DISTINCT uid) AS n_distinct,
       min(uid) AS min_uuid, max(uid) AS max_uuid,
       cast(sum(CASE WHEN substr(uid, 15, 1) = '4'
                      AND substr(uid, 20, 1) IN ('8','9','a','b')
                     THEN 1 ELSE 0 END) AS bigint) AS n_layout_ok
FROM u GROUP BY event_type ORDER BY event_type""",
    tags=("scalar", "uuid"),
)
def uuid_from_int_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference producer's deterministic trade_id layout
    (uuid.UUID(int=i, version=4), /root/reference/redpanda/producer.py via
    generator.py:44) expressed as pure SQL over event ids and certified
    cross-engine: distinctness is preserved (the id is injective for
    ints whose bits avoid the forced nibbles — true for all sub-2^63 ids),
    and every produced string carries the version-4 / RFC-variant nibbles.
    tests/test_generator.py ties this same layout bit-for-bit to Python's
    uuid module; one scan + one aggregate here."""
    e = load_table(spark, sf_dir, "events")
    uid = F.expr(_uuid_from_int_spark("event_id"))
    # dashed string positions: version char lands at 15, variant at 20
    return (e.select("event_type", uid.alias("uid"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("uid").alias("n_distinct"),
                 F.min("uid").alias("min_uuid"),
                 F.max("uid").alias("max_uuid"),
                 F.sum(F.when((F.substring("uid", 15, 1) == "4")
                              & F.substring("uid", 20, 1).isin(
                                  "8", "9", "a", "b"), 1)
                       .otherwise(0)).alias("n_layout_ok"))
            .orderBy("event_type"))
