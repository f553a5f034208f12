"""Snapshot-retention bookkeeping as a driver-checkable query (SURVEY.md
section 2 S4/maintenance; VERDICT r6 stretch item).

The real retention job (maintenance.expire_snapshots — the plain-parquet
analogue of Iceberg's ``expire_snapshots``) walks version directories on
disk, which the driver's DuckDB gate cannot see. This query pins the
DECISION SEMANTICS instead, over a deterministic manifest derived from the
orders table: one snapshot version per order month (version = yyyymm), with
file-count/byte bookkeeping aggregated from the month's orders.

Two retention policies are classified side by side, matching
maintenance.expire_snapshots exactly (victims = sorted versions[:n - keep]
minus the current pointer, current = max version):

- ``status``       keep = 2: the newest two versions survive.
- ``status_keep0`` keep = 0: ONLY the current-pointer version survives —
  the edge maintenance.py:70-72 special-cases (a naive ``versions[:-0]``
  empty-slice would instead keep everything); a green row here pins that
  boundary cross-engine.

tests/test_maintenance.py cross-checks this classification against what
``expire_snapshots`` actually deletes on a real on-disk fixture, so the SQL
semantics and the filesystem job cannot drift apart.

Scale stance: manifests are metadata (one row per snapshot — thousands, not
billions), so the single-partition global window is correct by design; the
per-version aggregate underneath is an ordinary distributed hash aggregate
over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import load_table

KEEP = 2

_ORACLE = f"""
WITH m AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS version,
         count(*) AS n_files,
         cast(sum(cast(floor(o_totalprice) AS bigint)) AS bigint)
           AS total_bytes
  FROM orders GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY version DESC) AS rd,
             max(version) OVER () AS mx
      FROM m)
SELECT cast(version AS int) AS version, n_files, total_bytes,
       CASE WHEN rd <= {KEEP} THEN 'keep' ELSE 'expire' END AS status,
       CASE WHEN version = mx THEN 'keep' ELSE 'expire' END AS status_keep0
FROM r ORDER BY version"""


@register(
    "snapshot_retention_audit",
    oracle=_ORACLE,
    tags=("maintenance", "iceberg_analogue"),
)
def snapshot_retention_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify snapshot versions keep/expire under keep=2 and keep=0
    retention, per maintenance.expire_snapshots' exact victim rule (module
    docstring). Manifest = one version per order month; bytes bookkeeping =
    floor(o_totalprice) so both engines truncate identically (DuckDB's
    double->bigint cast rounds, Spark's truncates — floor first removes the
    divergence)."""
    o = load_table(spark, sf_dir, "orders")
    m = (o.groupBy((F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                   .cast("int").alias("version"))
         .agg(F.count(F.lit(1)).alias("n_files"),
              F.sum(F.floor("o_totalprice").cast("bigint"))
              .alias("total_bytes")))
    w = Window.orderBy(F.col("version").desc())
    wall = Window.partitionBy()
    r = (m.withColumn("rd", F.row_number().over(w))
         .withColumn("mx", F.max("version").over(wall)))
    return (r.select(
        "version", "n_files", "total_bytes",
        F.when(F.col("rd") <= KEEP, F.lit("keep"))
         .otherwise(F.lit("expire")).alias("status"),
        F.when(F.col("version") == F.col("mx"), F.lit("keep"))
         .otherwise(F.lit("expire")).alias("status_keep0"))
        .orderBy("version"))
