"""Snapshot diff → changelog derivation: given two versions of a keyed
table, emit the insert/update/delete changelog between them — the
inverse of the MERGE sink (cdc.upsert applies a changelog; this derives
one), and the batch twin of Iceberg's changelog view / `create_changelog_
view` procedure. A 100 TB pipeline uses this to turn periodic full
snapshots from an upstream system into an incremental feed.

Versions are derived deterministically from events (the merge_replay.py
parity device): version A = latest state per (user_id, event_type) among
even event_ids, version B = latest among ALL events — so B evolves A by
the odd-id arrivals. The diff is ONE full-outer join on the key: key in
B only → insert, key in A only → delete, both with changed value →
update, both equal → dropped (no-op suppression — a changelog must not
carry unchanged rows).

Scale stance: one co-partitioned full-outer join on the snapshot key +
a per-kind aggregate; checksums make the oracle certify changelog
CONTENT, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_LATEST = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) rn
  FROM events {where}) WHERE rn = 1"""


def _latest(e: DataFrame, even_only: bool) -> DataFrame:
    src = e.filter(F.pmod("event_id", 2) == 0) if even_only else e
    w = (W.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    return (src.select("user_id", "event_type", "event_id", "value",
                       F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1).drop("rn"))


@register(
    "snapshot_diff_changelog",
    oracle=f"""
WITH a AS ({_LATEST.format(where="WHERE event_id % 2 = 0")}),
b AS ({_LATEST.format(where="")}),
diff AS (
  SELECT CASE WHEN a.user_id IS NULL THEN 'insert'
              WHEN b.user_id IS NULL THEN 'delete'
              ELSE 'update' END AS kind,
         coalesce(a.user_id, b.user_id) AS user_id,
         coalesce(a.event_id, -1) AS old_id,
         coalesce(b.event_id, -1) AS new_id
  FROM a FULL OUTER JOIN b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
  WHERE a.user_id IS NULL OR b.user_id IS NULL
     OR a.event_id <> b.event_id)
SELECT kind, cast(count(*) AS bigint) AS n_rows,
       cast(sum(user_id) AS bigint) AS user_checksum,
       cast(sum(old_id) AS bigint) AS old_id_checksum,
       cast(sum(new_id) AS bigint) AS new_id_checksum
FROM diff GROUP BY kind ORDER BY kind""",
    tags=("cdc", "changelog", "scale-pattern"),
)
def snapshot_diff_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(kind, n_rows, user_checksum, old_id_checksum, new_id_checksum):
    the insert/update/delete changelog between snapshot A (even-id latest
    state) and snapshot B (all-event latest state), no-op rows suppressed
    (module docstring). Note 'delete' is impossible under this
    construction (A's keys ⊆ B's), so its absence from the output is
    itself part of the verified contract."""
    e = load_table(spark, sf_dir, "events")
    a = _latest(e, even_only=True).select(
        F.col("user_id").alias("au"), F.col("event_type").alias("at"),
        F.col("event_id").alias("aid"))
    b = _latest(e, even_only=False).select(
        F.col("user_id").alias("bu"), F.col("event_type").alias("bt"),
        F.col("event_id").alias("bid"))
    j = a.join(b, (F.col("au") == F.col("bu"))
               & (F.col("at") == F.col("bt")), "full_outer")
    diff = (j.filter(F.col("au").isNull() | F.col("bu").isNull()
                     | (F.col("aid") != F.col("bid")))
            .select(
                F.when(F.col("au").isNull(), "insert")
                .when(F.col("bu").isNull(), "delete")
                .otherwise("update").alias("kind"),
                F.coalesce("au", "bu").alias("user_id"),
                F.coalesce("aid", F.lit(-1)).alias("old_id"),
                F.coalesce("bid", F.lit(-1)).alias("new_id")))
    return (diff.groupBy("kind")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum("user_id").cast("long").alias("user_checksum"),
                 F.sum("old_id").cast("long").alias("old_id_checksum"),
                 F.sum("new_id").cast("long").alias("new_id_checksum"))
            .orderBy("kind"))
