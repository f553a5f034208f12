"""Property tests: the stream-replay queries' window-function formulations
must equal straightforward sequential simulations of the stateful streaming
semantics they claim to replay — on random arrival sequences that stress
out-of-order arrival, boundary lateness, and TTL-edge gaps."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F, Window as W

from redpanda_iceberg_duckdb_spark.operators.stream_replay import (
    _DELAY_US, _N_KPARTS, _TTL_US)

_T0 = dt.datetime(2024, 1, 1)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(eid, _T0 + dt.timedelta(seconds=sec), uid, "e", 1.0)
         for eid, sec, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")


def _late_sim(rows):
    """Sequential watermark simulation: per kpart, running max event time;
    drop when more than the delay behind it."""
    hw = {}
    dropped = 0
    for eid, sec, uid in sorted(rows):
        kp = uid % _N_KPARTS
        ts_us = sec * 1_000_000
        if kp in hw and ts_us < hw[kp] - _DELAY_US:
            dropped += 1
        hw[kp] = max(hw.get(kp, ts_us), ts_us)
    return dropped


def _dedup_sim(rows):
    """Sequential keyed-TTL simulation in event-time order (ties by id):
    keep when the key is unseen or quiet past the TTL; refresh on access."""
    last = {}
    kept = 0
    for eid, sec, uid in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        ts_us = sec * 1_000_000
        if uid not in last or ts_us - last[uid] > _TTL_US:
            kept += 1
        last[uid] = ts_us
    return kept


# distinct event_ids; seconds span crosses the 600 s delay and 1800 s TTL
_rows = st.lists(
    st.tuples(st.integers(0, 10_000),     # event_id (deduped below)
              st.integers(0, 5_000),      # seconds offset
              st.integers(0, 5)),         # user_id (few keys -> collisions)
    min_size=1, max_size=40,
    unique_by=lambda r: r[0])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_rows)
def test_late_drop_matches_sequential_watermark(spark, rows):
    e = _events_df(spark, rows)
    arr = e.select(
        "event_id",
        F.pmod("user_id", F.lit(_N_KPARTS)).alias("kpart"),
        F.unix_micros("ts").alias("ts_us"))
    w = (W.partitionBy("kpart").orderBy("event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    hw = arr.select("ts_us", F.max("ts_us").over(w).alias("high_water"))
    got = hw.filter(F.col("high_water").isNotNull()
                    & (F.col("ts_us") < F.col("high_water") - _DELAY_US)
                    ).count()
    assert got == _late_sim(rows)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_rows)
def test_ttl_dedup_matches_sequential_state(spark, rows):
    e = _events_df(spark, rows)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    keyed = e.select("user_id", "event_id",
                     F.unix_micros("ts").alias("ts_us"))
    prev = F.lag("ts_us").over(w)
    got = (keyed.select(
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > _TTL_US), 1)
        .otherwise(0).alias("is_kept"))
        .agg(F.sum("is_kept")).collect()[0][0])
    assert got == _dedup_sim(rows)
