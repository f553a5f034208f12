"""Batch replays of stateful Structured Streaming semantics (SURVEY.md
section 2.9 St4 + the streaming dedup in streaming/dedup_stream.py), expressed
as driver-checkable registered queries.

The streaming operators themselves cannot meet the driver's DuckDB oracle
(readStream output is not a deterministic batch expression and the sandbox has
no broker), but their SEMANTICS — watermark-based late-data drop, and
keyed dedup with a state TTL — are pure functions of (arrival order,
event time) and replay exactly as window expressions over the batch events
table. A green row here certifies the rule the stateful operator enforces;
tests/test_stateful_streaming.py separately proves the streaming
implementations produce the same answers micro-batch by micro-batch.

Scale stance: both replays window-partition by key (synthetic Kafka partition
/ dedup key), so the replay parallelizes per key group exactly like the
streaming state store partitions by key — no global ordering anywhere. At
100 TB the production path is the streaming operator (state in RocksDB,
O(keys) memory); the replay is the verification twin, running as one scan +
one partitioned window + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

# Watermark delay for the late-data replay: 10 minutes, in microseconds.
_DELAY_US = 600_000_000

# State TTL for the dedup replay: 30 minutes, in microseconds.
_TTL_US = 1_800_000_000

_N_KPARTS = 8


@register(
    "late_data_drop_replay",
    oracle=f"""
WITH arr AS (
  SELECT event_id, user_id % {_N_KPARTS} AS kpart, event_type,
         epoch_us(ts) AS ts_us
  FROM events),
hw AS (
  SELECT event_type, ts_us,
         max(ts_us) OVER (PARTITION BY kpart ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS high_water
  FROM arr),
cls AS (
  SELECT event_type,
         CASE WHEN high_water IS NOT NULL
                   AND ts_us < high_water - {_DELAY_US}
              THEN 1 ELSE 0 END AS is_late,
         CASE WHEN high_water IS NOT NULL
                   AND ts_us < high_water - {_DELAY_US}
              THEN high_water - ts_us END AS lateness_us
  FROM hw)
SELECT event_type,
       cast(sum(1 - is_late) AS bigint) AS n_accepted,
       cast(sum(is_late) AS bigint) AS n_dropped_late,
       max(lateness_us) AS max_lateness_us
FROM cls GROUP BY event_type ORDER BY event_type""",
    tags=("streaming", "watermark", "replay"),
)
def late_data_drop_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St4 watermark semantics replayed over the batch events table: arrival
    order is event_id within a synthetic Kafka partition (user_id mod 8,
    mirroring the reference producer's keyed partitioning,
    /root/reference/redpanda/producer.py), the high-watermark is the running
    max event time already seen on that partition, and an event is dropped
    as late when its event time trails the high-watermark by more than the
    10-minute delay — exactly what ``withWatermark("ts", "10 minutes")``
    enforces per input partition before windowed state.

    Plan: one scan -> per-kpart running-max window (8-way parallel, no
    global sort) -> two-branch conditional -> per-type aggregate. The
    running max is O(1) state per partition — the same state the streaming
    watermark tracker keeps."""
    e = load_table(spark, sf_dir, "events")
    arr = e.select(
        "event_id", "event_type",
        F.pmod("user_id", F.lit(_N_KPARTS)).alias("kpart"),
        F.unix_micros("ts").alias("ts_us"))
    w = (W.partitionBy("kpart").orderBy("event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    hw = arr.select(
        "event_type", "ts_us", F.max("ts_us").over(w).alias("high_water"))
    late = (F.col("high_water").isNotNull()
            & (F.col("ts_us") < F.col("high_water") - _DELAY_US))
    cls = hw.select(
        "event_type",
        F.when(late, 1).otherwise(0).alias("is_late"),
        F.when(late, F.col("high_water") - F.col("ts_us"))
         .alias("lateness_us"))
    return (cls.groupBy("event_type")
            .agg(F.sum(1 - F.col("is_late")).alias("n_accepted"),
                 F.sum("is_late").alias("n_dropped_late"),
                 F.max("lateness_us").alias("max_lateness_us"))
            .orderBy("event_type"))


@register(
    "stream_dedup_replay",
    oracle=f"""
WITH keyed AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events),
flagged AS (
  SELECT event_type,
         CASE WHEN lag(ts_us) OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts_us, event_id) IS NULL
              OR ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts_us, event_id)
                 > {_TTL_US}
              THEN 1 ELSE 0 END AS is_kept
  FROM keyed)
SELECT event_type,
       count(*) AS n_events,
       cast(sum(is_kept) AS bigint) AS n_kept,
       cast(count(*) - sum(is_kept) AS bigint) AS n_suppressed
FROM flagged GROUP BY event_type ORDER BY event_type""",
    tags=("streaming", "dedup", "replay"),
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed streaming dedup with a 30-minute state TTL (refresh-on-access),
    replayed as a batch: for key (user_id, event_type) in event-time order,
    an event is a duplicate iff the same key was seen within the TTL —
    once the key goes quiet longer than the TTL its state expires and the
    next occurrence is kept again. This is the batch twin of
    ``dropDuplicates`` over a watermarked stream with per-key TTL state
    (streaming/dedup_stream.py); TTL-from-last-seen makes the rule a pure
    lag comparison, the same transition the state store evaluates on each
    update.

    Plan: one scan -> per-key lag window (parallel across keys, matching
    the state store's key partitioning) -> per-type aggregate. No global
    order, no iteration; state per key is one timestamp, identical to the
    streaming operator's."""
    e = load_table(spark, sf_dir, "events")
    keyed = e.select("user_id", "event_type", "event_id",
                     F.unix_micros("ts").alias("ts_us"))
    w = W.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = keyed.select(
        "event_type",
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > _TTL_US), 1)
         .otherwise(0).alias("is_kept"))
    return (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("is_kept").alias("n_kept"),
                 (F.count(F.lit(1)) - F.sum("is_kept")).alias("n_suppressed"))
            .orderBy("event_type"))
