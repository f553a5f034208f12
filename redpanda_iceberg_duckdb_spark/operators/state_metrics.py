"""Streaming state-size accounting (round-11 verdict item 7): run a REAL
Structured Streaming dedup over event-time-ordered micro-batches and
surface the state store's own metrics (``stateOperators`` from the query
progress) — rows held, rows updated — proving the watermark actually
BOUNDS state instead of asserting it in prose.

Why this query has no DuckDB oracle: the numbers come from the engine's
state store, not from the data — there is nothing for SQL to recompute
(the driver records the weaker rows-only check). The correctness weight
sits in tests/test_stateful_streaming.py, which asserts the closed-form
expectations this module's docstrings claim: every unique key updates
state exactly once (rows_updated == batch input), eviction keeps the
held-rows peak strictly below the total key count, and the final batch
retains only the un-expired horizon.

Protocol: events split into 4 event-time quartiles (one parquet file
each), replayed availableNow with maxFilesPerTrigger=1 through
dedup_exact_stream (dropDuplicatesWithinWatermark keyed by event_id,
1-hour watermark). Quartiles span ~7.5 days each, so each batch's
watermark leaps past all previous state — by design the worst case
eviction has to handle. Scale stance: state per key is one expiry
timestamp; memory is O(keys within the watermark horizon), the property
this query measures; the replay source is a tmp dir built from the
dataset and removed before returning (metrics live in 4 driver rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..streaming.dedup_stream import dedup_exact_stream
from ..tables import load_table

_N_CHUNKS = 4
_WATERMARK = "1 hour"


def chunked_replay_metrics(spark: SparkSession, sf_dir: str,
                           ) -> list[dict]:
    """Run the chunked availableNow dedup replay; return one dict per
    micro-batch with input rows and stateOperators metrics."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id",
                                                   "ts")
    # Event-TIME-range chunking (not ntile): two scalar aggregates and a
    # map-side bucket expression — no global single-partition sort, the
    # same split at any corpus size. Chunks are near-equal because event
    # times are ~uniform; the test's bounds don't assume equality.
    lo, hi = e.agg(F.min(F.unix_micros("ts")),
                   F.max(F.unix_micros("ts"))).head()
    span = max(int(hi) - int(lo) + 1, 1)
    chunked = e.withColumn(
        "chunk", F.least(
            ((F.unix_micros("ts") - F.lit(int(lo)))
             * _N_CHUNKS / F.lit(span)).cast("int"),
            F.lit(_N_CHUNKS - 1)))
    tmp = tempfile.mkdtemp(prefix="state_metrics_")
    try:
        for i in range(_N_CHUNKS):
            (chunked.filter(F.col("chunk") == i).drop("chunk")
             .coalesce(1)
             .write.parquet(f"{tmp}/chunk={i}"))
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType())])
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .option("recursiveFileLookup", "true")
                  .parquet(tmp))
        name = f"state_metrics_{uuid.uuid4().hex[:8]}"
        q = (dedup_exact_stream(stream, keys=["event_id"], ts_col="ts",
                                watermark=_WATERMARK)
             .writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        try:
            q.awaitTermination(300)
            progress = list(q.recentProgress)
        finally:
            q.stop()
        spark.catalog.dropTempView(name)
        out = []
        for p in progress:
            if not p.get("numInputRows"):
                continue
            so = (p.get("stateOperators") or [{}])[0]
            out.append({
                "input_rows": int(p["numInputRows"]),
                "state_rows_total": int(so.get("numRowsTotal", 0)),
                "state_rows_updated": int(so.get("numRowsUpdated", 0)),
                "state_rows_removed": int(so.get("numRowsRemoved", 0)),
            })
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "stream_state_bound_replay",
    oracle=None,   # engine state-store metrics: nothing for SQL to recompute
    tags=("streaming", "state", "watermark", "metrics"),
)
def stream_state_bound_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch state accounting of the watermarked streaming dedup
    (module docstring has the protocol): batch_id, rows in, state rows
    updated/held/removed — the numbers that prove bounded state. Returned
    as a 4-row driver frame (rows-only check; the pytest holds the
    closed-form assertions)."""
    rows = chunked_replay_metrics(spark, sf_dir)
    return spark.createDataFrame(
        [(i, r["input_rows"], r["state_rows_updated"],
          r["state_rows_total"], r["state_rows_removed"])
         for i, r in enumerate(rows)],
        "batch_id int, input_rows long, state_rows_updated long, "
        "state_rows_total long, state_rows_removed long")
