"""Streaming deduplication — the ingest-side twin of the batch dedup
operators: at-least-once sources (Kafka redeliveries, producer retries)
inject duplicate events, and the stream must drop them BEFORE they reach
aggregates or the lake.

Two tools, different state costs:
- ``dedup_exact_stream``: dropDuplicatesWithinWatermark(key) — state per key
  is retained only until the watermark passes it, so state size is bounded
  by (keys per watermark window), not by stream history. This is the 100 TB
  answer; unbounded dropDuplicates() state grows forever.
- ``dedup_content_stream``: same, keyed by a content hash (md5 of the
  payload columns) — catches retried producers that re-sent the same record
  under a fresh event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_exact_stream(events: DataFrame, *, keys: list[str] | None = None,
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate events by key within the watermark horizon.

    Uses dropDuplicatesWithinWatermark: two events with the same key whose
    timestamps fall within the watermark delay of each other are collapsed
    to the first arrival; state for a key is freed once the watermark moves
    past it (bounded state — the property plain dropDuplicates lacks on
    streams)."""
    keys = keys or ["event_id"]
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def dedup_content_stream(events: DataFrame, *, payload_cols: list[str],
                         ts_col: str = "ts",
                         watermark: str = "1 hour") -> DataFrame:
    """Content-hash streaming dedup: key = md5 over the payload columns, so
    a retried producer that re-sends identical content under a new event_id
    still collapses. The hash column is dropped on the way out."""
    hashed = events.withColumn(
        "_content_key",
        F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                    for c in payload_cols])))
    return (hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_content_key"])
            .drop("_content_key"))
