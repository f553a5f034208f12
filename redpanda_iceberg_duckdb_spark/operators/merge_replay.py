"""Driver-checkable replays of the mutable-table operations: MERGE upsert,
SCD2 history application, and the stream-stream LEFT OUTER interval join —
each running the REAL helper the pipeline ships (cdc.upsert / cdc.scd2_apply /
a plan-identical outer interval join), over deterministic slices of the
events table so the DuckDB oracle can certify the semantics.

Reference parity: the reference's mutable surface is Iceberg appends plus
DuckDB-side reconciliation (/root/reference/duckdb/query_and_publish.py); the
MERGE/SCD2 operators here are the engine-level forms of the row-level
mutations a lakehouse pipeline layers on top (Iceberg MERGE INTO compiles to
exactly the union+anti-join shape cdc.upsert builds, copy-on-write).

Scale stance: every query is one shuffle on the business key (the window /
join key), no iteration, no driver data. The outer interval join is an
equi-join on user_id with the time range as residual — linear in inputs,
and the NULL-extension for unmatched rows is what the streaming outer join
emits at watermark expiry (streaming/joins.py holds the stateful twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .cdc import scd2_apply, upsert

# Latest row per (user_id, event_type) within an event_id parity class —
# parity makes snapshot vs changes deterministic and disjoint.
_LATEST_PARITY = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) rn
  FROM events WHERE event_id % 2 = {par}) WHERE rn = 1"""


def _latest_parity(e: DataFrame, par: int) -> DataFrame:
    w = (W.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    return (e.filter(F.pmod("event_id", 2) == par)
            .select("user_id", "event_type", "event_id", "value",
                    F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .drop("rn"))


@register(
    "merge_upsert_replay",
    oracle=f"""
WITH snap AS ({_LATEST_PARITY.format(par=0)}),
chg AS ({_LATEST_PARITY.format(par=1)}),
merged AS (
  SELECT * FROM chg
  UNION ALL
  SELECT s.* FROM snap s
  WHERE NOT EXISTS (SELECT 1 FROM chg c
                    WHERE c.user_id = s.user_id
                      AND c.event_type = s.event_type))
SELECT event_type,
       count(*) AS n_rows,
       cast(sum(event_id) AS bigint) AS id_checksum,
       cast(sum(cast(value AS decimal(18,2))) AS double) AS value_checksum
FROM merged GROUP BY event_type ORDER BY event_type""",
    tags=("cdc", "merge", "replay"),
)
def merge_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics through the real ``cdc.upsert`` helper: the
    even-event_id latest-state snapshot merged with the odd-event_id
    latest-state changelog — changed keys take the change row, unmatched
    snapshot rows pass through. Output is a per-type row count + checksums
    so the oracle certifies the merged CONTENT, not just cardinality."""
    e = load_table(spark, sf_dir, "events")
    snap = _latest_parity(e, 0)
    chg = _latest_parity(e, 1)
    merged = upsert(snap, chg, ["user_id", "event_type"])
    return (merged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("event_id").alias("id_checksum"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("value_checksum"))
            .orderBy("event_type"))


@register(
    "scd2_history_replay",
    oracle="""
WITH firsts AS (
  SELECT user_id, cast(floor(value / 100.0) AS int) AS band, ts FROM (
    SELECT user_id, value, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) rn
    FROM events) WHERE rn = 1),
lasts AS (
  SELECT user_id, cast(floor(value / 100.0) AS int) AS band, ts FROM (
    SELECT user_id, value, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) rn
    FROM events) WHERE rn = 1),
hist AS (
  -- unchanged band: the original row stays current.
  SELECT f.band, 'current' AS status, f.user_id
  FROM firsts f JOIN lasts l USING (user_id) WHERE f.band = l.band
  UNION ALL
  -- changed band: old row closes, new row opens.
  SELECT f.band, 'closed' AS status, f.user_id
  FROM firsts f JOIN lasts l USING (user_id) WHERE f.band <> l.band
  UNION ALL
  SELECT l.band, 'current' AS status, l.user_id
  FROM firsts f JOIN lasts l USING (user_id) WHERE f.band <> l.band)
SELECT band, status, count(*) AS n_rows,
       cast(sum(user_id) AS bigint) AS user_checksum
FROM hist GROUP BY band, status ORDER BY band, status""",
    tags=("cdc", "scd2", "replay"),
)
def scd2_history_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history through the real ``cdc.scd2_apply``: open a history from
    each user's FIRST event (attribute = value band), apply each user's
    LAST event as the change feed, and summarize the resulting history —
    rows whose band drifted are closed out and re-opened, stable bands stay
    current. The oracle states the same transition rules as pure SQL over
    first/last windows."""
    e = load_table(spark, sf_dir, "events")
    band = F.floor(F.col("value") / 100.0).cast("int").alias("band")
    wf = W.partitionBy("user_id").orderBy("ts", "event_id")
    wl = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    firsts = (e.select("user_id", band, "ts",
                       F.row_number().over(wf).alias("rn"))
              .filter(F.col("rn") == 1)
              .select("user_id", "band", F.col("ts").alias("valid_from"),
                      F.lit(None).cast("timestamp").alias("valid_to")))
    lasts = (e.select("user_id", band, "ts",
                      F.row_number().over(wl).alias("rn"))
             .filter(F.col("rn") == 1)
             .select("user_id", "band", "ts"))
    hist = scd2_apply(firsts, lasts, key="user_id", ts="ts", attrs=["band"])
    status = (F.when(F.col("valid_to").isNull(), "current")
              .otherwise("closed").alias("status"))
    return (hist.select("band", status, "user_id")
            .groupBy("band", "status")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("user_id").alias("user_checksum"))
            .orderBy("band", "status"))


@register(
    "stream_outer_join_replay",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       count(s.event_id) > 0 AS matched,
       cast(count(s.event_id) AS bigint) AS n_signups,
       min(s.event_id) AS first_signup_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id
 AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR
GROUP BY 1, 2 ORDER BY 1""",
    tags=("streaming", "join", "replay"),
)
def stream_outer_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join, replayed batch-side: every
    purchase appears exactly once — matched purchases with their signup
    count and first signup id, unmatched ones NULL-extended, which is the
    row the streaming outer join emits when the watermark passes the
    purchase's join window (streaming/joins.py). Equi-join on user_id,
    range residual, then a purchase-keyed aggregate: one shuffle."""
    e = load_table(spark, sf_dir, "events")
    p = (e.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    s = (e.filter(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("s_user"),
                 F.col("event_id").alias("signup_id"),
                 F.col("ts").alias("s_ts")))
    joined = p.join(
        s, (F.col("user_id") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left")
    return (joined.groupBy("purchase_id", "user_id")
            .agg((F.count("signup_id") > 0).alias("matched"),
                 F.count("signup_id").alias("n_signups"),
                 F.min("signup_id").alias("first_signup_id"))
            .orderBy("purchase_id"))
