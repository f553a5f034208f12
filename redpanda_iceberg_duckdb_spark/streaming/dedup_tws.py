"""Streaming dedup on Spark 4's transformWithState (arbitrary stateful
processing v2) — the API Spark is converging on for custom state logic.

dedup_stream.py's dropDuplicatesWithinWatermark stays the production path
for PLAIN keyed dedup (built-in operator, no Python in the loop); this
module re-expresses the same contract through a user-owned
StatefulProcessor to carry the engine onto the new API surface: explicit
ValueState per key, event-time timers for watermark eviction, and a
processor that NARRATES its state transitions (emit / dup / evict rows)
so the whole state machine is externally auditable — something the
built-in operator cannot do.

Engine semantics, probed empirically on Spark 4.1.2 (synthetic boundary
streams; see tests/test_tws_streaming.py which pins all three):
- within a micro-batch, input rows are processed BEFORE expired timers,
  so a key arriving in the same batch its timer fires still reads the
  old state (counts as dup) and the timer then clears it;
- a timer with timestamp T fires in the first batch whose watermark
  W >= T (NON-strict), where W is the lag-one watermark: floor-to-ms of
  the max event time over all PRIOR batches, minus the delay;
- after the last data batch, availableNow runs one final batch that
  advances the watermark to (global max - delay) and fires remaining
  timers.

Scale stance (100 TB): state per key is a single (expiry_ms, chunk)
tuple in RocksDB plus one registered timer; memory is O(keys within the
watermark horizon) exactly like the built-in operator. Keys partition
across executors by groupBy hash; the Python processor is Arrow-batched
per key group. transformWithState requires the RocksDB state store
provider — the replay sets it for its own query and restores the
session conf after.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle)

_ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def enable_protobuf_shim(spark: SparkSession) -> None:
    """Put the package's pbshim dir on the WORKER PYTHONPATH.

    transformWithState workers import protobuf gencode; in containers
    without the protobuf wheel the pbshim sitecustomize grafts the
    google-cloud-sdk's vendored runtime (no-op when real protobuf is
    importable). sc.environment feeds PythonFunction.envVars, which both
    the streaming driver worker and executor workers receive — so this
    works on an ALREADY-RUNNING session (the driver harness creates the
    session before our code runs; JVM-launch env is out of reach)."""
    shim = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pbshim")
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if shim not in cur.split(os.pathsep):
        env["PYTHONPATH"] = f"{cur}{os.pathsep}{shim}" if cur else shim


def tws_available() -> bool:
    """True when transformWithState's protobuf dependency is satisfiable
    — either a real protobuf install or the SDK runtime the shim grafts."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return os.path.isdir("/usr/lib/google-cloud-sdk/platform/"
                             "google_appengine/google/protobuf")


class DedupNarratingProcessor(StatefulProcessor):
    """Keyed first-arrival dedup with watermark eviction, narrating every
    state transition as an output row (chunk int, kind string):

    - 'emit'  — key unseen (or evicted): anchor state at the key's
                earliest event in the batch, register an eviction timer
                at anchor + delay; chunk = the anchor event's chunk.
    - 'dup'   — key arrived while state is live: drop; chunk = the
                arriving batch's chunk.
    - 'evict' — the eviction timer fired: clear state; chunk = the
                STORED anchor chunk, so eviction counts group by where
                the state was created.

    One output row per (key, batch-with-events) plus one per eviction —
    the corpus-sized payload never leaves the executors."""

    def __init__(self, delay_ms: int):
        self.delay_ms = delay_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.seen = handle.getValueState("seen", "expiry_ms long, chunk int")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        dfs = list(rows)
        if self.seen.exists():
            arriving = int(dfs[0]["chunk"].iloc[0])
            yield pd.DataFrame({"chunk": [arriving], "kind": ["dup"]})
            return
        first = pd.concat(dfs).sort_values("ts").iloc[0]
        ts_ms = int(first["ts"].value // 1_000_000)   # ns -> ms floor
        anchor_chunk = int(first["chunk"])
        self.seen.update((ts_ms + self.delay_ms, anchor_chunk))
        self.handle.registerTimer(ts_ms + self.delay_ms)
        yield pd.DataFrame({"chunk": [anchor_chunk], "kind": ["emit"]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        st = self.seen.get()
        self.seen.clear()
        yield pd.DataFrame({"chunk": [int(st[1])], "kind": ["evict"]})

    def close(self) -> None:
        pass


def dedup_stream_tws(events: DataFrame, *, key: str, ts_col: str = "ts",
                     watermark: str = "1 hour",
                     delay_ms: int = 3_600_000) -> DataFrame:
    """transformWithState twin of dedup_stream.dedup_exact_stream, with
    the narrated-transition output contract (chunk int, kind string).
    The input must carry an int 'chunk' column (batch label)."""
    return (events.withWatermark(ts_col, watermark)
            .groupBy(key)
            .transformWithStateInPandas(
                statefulProcessor=DedupNarratingProcessor(delay_ms),
                outputStructType="chunk int, kind string",
                outputMode="Append",
                timeMode="EventTime"))


def run_chunked_tws_replay(spark: SparkSession, chunk_dir: str, *,
                           key: str, schema: str,
                           watermark: str = "1 hour",
                           delay_ms: int = 3_600_000,
                           collect_progress: bool = False):
    """Drive an availableNow one-file-per-batch replay of the chunked
    parquet dir through dedup_stream_tws; returns (rows, progress).

    Sets the RocksDB state store provider (required by
    transformWithState) for the query and restores the prior session
    value after, so co-resident streaming queries keep their provider."""
    import uuid

    enable_protobuf_shim(spark)
    prior = spark.conf.get(_PROVIDER_CONF, None)
    if prior != _ROCKSDB:
        spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .option("recursiveFileLookup", "true")
                  .parquet(chunk_dir))
        out = dedup_stream_tws(stream, key=key, watermark=watermark,
                               delay_ms=delay_ms)
        name = f"tws_replay_{uuid.uuid4().hex[:8]}"
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        try:
            q.awaitTermination(600)
            progress = list(q.recentProgress) if collect_progress else []
        finally:
            q.stop()
        rows = spark.table(name).collect()
        spark.catalog.dropTempView(name)
        return rows, progress
    finally:
        if prior != _ROCKSDB:
            if prior is None:
                spark.conf.unset(_PROVIDER_CONF)
            else:
                spark.conf.set(_PROVIDER_CONF, prior)
