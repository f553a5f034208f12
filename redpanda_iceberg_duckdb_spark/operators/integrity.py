"""Data-integrity operators: order-independent table checksums.

The anti-entropy primitive a replicated lakehouse needs: prove two copies of
a table (two engines, two clusters, a pre/post-migration pair) hold the same
rows WITHOUT sorting or moving the data — each row hashes to a 62-bit value
and XOR folds them, so the checksum is insensitive to row order and
partitioning, embarrassingly parallel, and mergeable across partial scans.
The reference's verification step (/root/reference/duckdb/verify_iceberg.sql)
compares aggregates; a checksum catches what aggregates miss (swapped fields,
compensating errors).

Cross-engine: the row hash is the md5-tail uint64 (functions/hashing.py) of a
canonical '|'-joined string per row — decimal(18,2) for money, microsecond
ISO-8601 for timestamps — so Spark and DuckDB derive bit-identical checksums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_u64_duck, md5_u64_spark
from ..registry import register
from ..tables import load_table

_MOD = 1 << 62  # fold the uint64 hash into a signed-int64-safe range

# Canonical per-table row serializations (identical SQL text for both
# engines except the timestamp formatter).
_ROWS = {
    "customer": ("concat_ws('|', c_custkey, c_name, c_nationkey,"
                 " cast(c_acctbal as decimal(18,2)), c_mktsegment)"),
    "orders": ("concat_ws('|', o_orderkey, o_custkey, o_orderstatus,"
               " cast(o_totalprice as decimal(18,2)), {ts_o}, o_orderpriority)"),
    "lineitem": ("concat_ws('|', l_orderkey, l_linenumber, l_partkey,"
                 " cast(l_quantity as decimal(18,2)),"
                 " cast(l_extendedprice as decimal(18,2)),"
                 " cast(l_discount as decimal(18,2)),"
                 " l_returnflag, l_linestatus, {ts_l})"),
}
_TS_SPARK = {"ts_o": "date_format(o_orderdate, 'yyyy-MM-dd\\'T\\'HH:mm:ss.SSSSSS')",
             "ts_l": "date_format(l_shipdate, 'yyyy-MM-dd\\'T\\'HH:mm:ss.SSSSSS')"}
_TS_DUCK = {"ts_o": "strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f')",
            "ts_l": "strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S.%f')"}


def _oracle() -> str:
    parts = []
    for t, row in _ROWS.items():
        row_sql = row.format(**_TS_DUCK)
        parts.append(
            f"SELECT '{t}' AS table_name, count(*) AS n_rows,\n"
            f"       bit_xor(cast({md5_u64_duck(row_sql)} % {_MOD}"
            f" AS bigint)) AS checksum\nFROM {t}")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name"


@register("table_checksums", oracle=_oracle(), tags=("integrity", "scale"))
def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XOR-fold row-hash checksum + row count for customer/orders/lineitem.
    One scan per table, no shuffle at all until the single-row aggregates
    union (XOR partials combine map-side); at 100 TB this is the cheapest
    possible whole-table equality proof between replicas."""
    outs = []
    for t, row in _ROWS.items():
        row_sql = row.format(**_TS_SPARK)
        h = F.expr(f"cast({md5_u64_spark(row_sql)} % {_MOD} as bigint)")
        outs.append(
            load_table(spark, sf_dir, t)
            .select(h.alias("h"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(h)").alias("checksum"))
            .select(F.lit(t).alias("table_name"), "n_rows", "checksum"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("table_name")


@register(
    "referential_integrity_audit",
    oracle="""
SELECT 'lineitem->orders' AS relationship,
       (SELECT count(*) FROM lineitem) AS n_child,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders->customer' AS relationship,
       (SELECT count(*) FROM orders) AS n_child,
       (SELECT count(*) FROM orders od
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = od.o_custkey)) AS n_orphans
ORDER BY relationship""",
    tags=("integrity", "quality"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit over the fact chain (lineitem -> orders ->
    customer): child rows whose parent key is missing — the ingest-QA gate
    before any join-based pipeline trusts its dimensions. Each relationship
    is one left-anti join counting survivors; the anti join shuffles only
    keys (child side projected to its FK column first), and the parent side
    broadcasts when it fits. Zero orphans is the expected steady state; the
    operator exists to prove it cheaply at every ingest."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def audit(name: str, child: DataFrame, fk: str,
              parent: DataFrame, pk: str) -> DataFrame:
        keys = child.select(F.col(fk).alias("k"))
        orphans = keys.join(parent.select(F.col(pk).alias("k")),
                            "k", "left_anti")
        return (keys.agg(F.count(F.lit(1)).alias("n_child"))
                .join(F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("n_orphans"))))
                .select(F.lit(name).alias("relationship"),
                        "n_child", "n_orphans"))

    return (audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
            .unionAll(audit("orders->customer", orders, "o_custkey",
                            cust, "c_custkey"))
            .orderBy("relationship"))
