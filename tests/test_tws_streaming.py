"""transformWithState dedup port (round-14 verdict item 4).

Three layers of evidence:
1. synthetic boundary streams pin the probed engine semantics the
   DuckDB oracle encodes (non-strict timer firing on the lag-one
   watermark; input rows processed before same-batch timer expiry);
2. the registered replay query matches its closed-form oracle
   (tests/test_operator_oracles-style check, here at smoke SF);
3. the REAL RocksDB state store's own per-batch metrics (rows updated /
   held / removed from stateOperators) equal an independent pandas
   simulation of the same model — the engine-metric equality check
   state_metrics.py established for dropDuplicatesWithinWatermark.
"""

from __future__ import annotations

import datetime as dt

import pytest

from redpanda_iceberg_duckdb_spark.operators.tws15 import (
    _D_MS, _N_CHUNKS, chunked_tws_replay, dedup_stream_tws_replay)
from redpanda_iceberg_duckdb_spark.streaming.dedup_tws import (
    run_chunked_tws_replay, tws_available)

pytestmark = pytest.mark.skipif(
    not tws_available(),
    reason="no protobuf runtime for transformWithState workers")

_SCHEMA = "user_id long, ts timestamp, chunk int"


def _write_batch(spark, tmp, batch, rows):
    """rows: list of (user_id, epoch_ms, chunk)."""
    spark.createDataFrame(
        [(u, dt.datetime.fromtimestamp(ms / 1000.0, dt.timezone.utc)
          .replace(tzinfo=None), c) for u, ms, c in rows],
        _SCHEMA).coalesce(1).write.parquet(f"{tmp}/b{batch}")


def _replay(spark, tmp, delay_ms=10_000):
    rows, _ = run_chunked_tws_replay(
        spark, tmp, key="user_id", schema=_SCHEMA,
        watermark=f"{delay_ms // 1000} seconds", delay_ms=delay_ms)
    return sorted((r.chunk, r.kind) for r in rows)


T0 = 1_700_000_000_000  # ms epoch, far from any chunk math


def test_timer_fires_nonstrict_on_lag_one_watermark(spark, tmp_path):
    """Key X (expiry T0+D) must be evicted in the batch whose lag-one
    watermark EQUALS the expiry (W = max(prior) - D = T0+D): firing is
    W >= T, not W > T."""
    tmp = str(tmp_path)
    D = 10_000
    _write_batch(spark, tmp, 0, [(1, T0, 0)])
    _write_batch(spark, tmp, 1, [(2, T0 + 2 * D, 1)])   # W2 == expiry(X)
    _write_batch(spark, tmp, 2, [(3, T0 + 3 * D, 2)])
    out = _replay(spark, tmp, delay_ms=D)
    # X evicted (timer fired at W2); keys 2 and 3 still live at the end
    # (their expiries exceed the final watermark max-D).
    assert out == [(0, "emit"), (0, "evict"), (1, "emit"), (2, "emit")]


def test_input_rows_process_before_same_batch_timers(spark, tmp_path):
    """X reappears in the exact batch its timer becomes eligible: the
    arrival must read the OLD state (dup), and the timer then clears it
    — so a third appearance re-emits."""
    tmp = str(tmp_path)
    D = 10_000
    _write_batch(spark, tmp, 0, [(1, T0, 0)])
    _write_batch(spark, tmp, 1, [(2, T0 + 2 * D, 1)])   # advances W past X
    _write_batch(spark, tmp, 2, [(1, T0 + 3 * D, 2)])   # same-batch: dup
    _write_batch(spark, tmp, 3, [(1, T0 + 4 * D, 3)])   # state gone: emit
    out = _replay(spark, tmp, delay_ms=D)
    # key 2's expiry (T0+3D) EQUALS the final flush watermark
    # (max - D = T0+3D), so it is also evicted — non-strict again.
    assert out == [(0, "emit"), (0, "evict"), (1, "emit"), (1, "evict"),
                   (2, "dup"), (3, "emit")]


def test_tws_replay_matches_oracle_at_smoke(spark, sf_smoke):
    import duckdb

    from redpanda_iceberg_duckdb_spark.operators.tws15 import _ORACLE

    got = [(r.chunk, r.kind, r.n)
           for r in dedup_stream_tws_replay(spark, sf_smoke).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_smoke}/events.parquet')")
    assert got == con.execute(_ORACLE).fetchall()


def _expected_engine_metrics(sf_dir):
    """Independent pandas simulation of per-batch state metrics under
    the probed semantics: updates = emissions, removals attributed to
    the first batch whose lag-one watermark passes the anchor's expiry,
    totals = running inserts - removals."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["user_id", "ts"])
    us = t.column("ts").cast("int64").to_pylist()       # microseconds
    users = t.column("user_id").to_pylist()
    lo, hi = min(us), max(us)
    span = hi - lo + 1
    chunk_of = [min((u - lo) * _N_CHUNKS // span, _N_CHUNKS - 1)
                for u in us]
    m_ms = [None] * _N_CHUNKS                      # cumulative max, ms
    cand: dict[int, dict[int, int]] = {}           # user -> chunk -> t_ms
    for u, usec, c in zip(users, us, chunk_of):
        ms = usec // 1000
        m_ms[c] = ms if m_ms[c] is None else max(m_ms[c], ms)
        cand.setdefault(u, {})
        if c not in cand[u] or ms < cand[u][c]:
            cand[u][c] = ms
    for c in range(1, _N_CHUNKS):
        m_ms[c] = max(m_ms[c], m_ms[c - 1])

    def eviction_batch(t_ms):
        # end-of-batch j eviction: t + D <= W_j = m[j-1] - D; the final
        # flush batch (index N) uses the global max.
        for j in range(1, _N_CHUNKS + 1):
            if t_ms + 2 * _D_MS <= m_ms[j - 1]:
                return j
        return None

    upd = [0] * (_N_CHUNKS + 1)
    rem = [0] * (_N_CHUNKS + 1)
    for u, chunks in cand.items():
        anchor = None
        for c in sorted(chunks):
            live = anchor is not None and (
                eviction_batch(anchor) is None or eviction_batch(anchor) >= c)
            if not live:
                anchor = chunks[c]
                upd[c] += 1
                j = eviction_batch(anchor)
                if j is not None:
                    rem[j] += 1
    tot, run = [], 0
    for c in range(_N_CHUNKS + 1):
        run += upd[c] - rem[c]
        tot.append(run)
    return upd, rem, tot


def test_engine_state_metrics_equal_model(spark, sf_smoke):
    """The RocksDB store's own numbers — not our narration — must match
    the model: the state machine the oracle verifies is the one the
    engine actually ran."""
    _, progress = chunked_tws_replay(spark, sf_smoke,
                                     collect_progress=True)
    upd, rem, tot = _expected_engine_metrics(sf_smoke)
    seen = 0
    for p in progress:
        so = (p.get("stateOperators") or [{}])[0]
        if not p.get("numInputRows") and not so.get("numRowsRemoved"):
            continue
        b = p["batchId"]
        assert b <= _N_CHUNKS
        assert so.get("numRowsUpdated") == upd[b], (b, so)
        assert so.get("numRowsRemoved") == rem[b], (b, so)
        assert so.get("numRowsTotal") == tot[b], (b, so)
        seen += 1
    assert seen >= _N_CHUNKS  # all data batches reported state metrics
