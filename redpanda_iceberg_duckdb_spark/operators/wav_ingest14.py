"""WAV ingest dead-letter replay — the audio modality driven through the
same St5 schema-enforcement contract the JSON ingest replays
(operators/replay.streaming_validate_replay; reference analogue
/root/reference/validation/e2e.sh:67-105): a corpus of WAV payloads with
deterministic synthetic corruption is split by the REAL streaming
validator (streaming/wav_ingest.validate_wav_stream — the same function
the micro-batch test drives), and the driver's cross-engine gate checks
the routing AND the decoded stats of the surviving rows.

Corruption plan (doc_id arithmetic, first match wins — the DuckDB oracle
replays the same CASE):
  doc_id % 13 == 0  -> RIFF magic replaced with 'JUNK'   -> dead not_riff
  doc_id %  7 == 0  -> payload truncated to 16 bytes     -> dead missing_chunk
  doc_id %  5 == 0  -> fmt channels patched to 2 (stereo)-> dead unsupported_format
  otherwise         -> intact canonical fixture WAV      -> good

Good rows must ALSO decode to the right samples, so the oracle recomputes
peak/zero-crossing sums from the hex-expanded text (multimodal13's
idiom) — a green row proves routing + decode together, not just counts.

Scale stance (100 TB): builder and validator are two map-only Arrow
passes (payloads never shuffle); the result is a 4-row aggregate.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..streaming.wav_ingest import validate_wav_stream
from ..tables import load_table
from .multimodal import with_payload
from .multimodal13 import _DUCK_SAMPLE, _N_SAMP, wav_fixture

# fmt body starts at byte 32 (RIFF 12 + LIST 12 + chunk header 8);
# channels is its second u16 -> bytes 34-35.
_CHANNELS_OFF = 34


def corrupt_wav(doc_id: int, wav: bytes) -> bytes:
    """Deterministic corruption by doc_id (module docstring order)."""
    if doc_id % 13 == 0:
        return b"JUNK" + wav[4:]
    if doc_id % 7 == 0:
        return wav[:16]
    if doc_id % 5 == 0:
        return (wav[:_CHANNELS_OFF] + struct.pack("<H", 2)
                + wav[_CHANNELS_OFF + 2:])
    return wav


def _build_corrupted(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "payload": [corrupt_wav(int(d), wav_fixture(bytes(p)))
                        for d, p in zip(pdf["doc_id"], pdf["payload"])]})


_ORACLE = f"""
WITH cls AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN 'dead_not_riff'
              WHEN doc_id % 7 = 0 THEN 'dead_missing_chunk'
              WHEN doc_id % 5 = 0 THEN 'dead_unsupported_format'
              ELSE 'good' END AS status,
         [CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
          FOR u IN {_DUCK_SAMPLE.format(n=_N_SAMP)}] AS s
  FROM documents),
st AS (
  SELECT status,
         CASE WHEN status = 'good'
              THEN list_max([abs(x) FOR x IN s]) ELSE 0 END AS peak,
         CASE WHEN status = 'good'
              THEN list_sum([CASE WHEN s[j+1] * s[j+2] < 0 THEN 1 ELSE 0 END
                             FOR j IN range({_N_SAMP - 1})])
              ELSE 0 END AS zc
  FROM cls)
SELECT status, cast(count(*) AS bigint) AS n,
       cast(sum(peak) AS bigint) AS sum_peak_abs,
       cast(coalesce(sum(zc), 0) AS bigint) AS sum_zero_crossings
FROM st GROUP BY status ORDER BY status"""


@register(
    "wav_ingest_dead_letter_replay",
    oracle=_ORACLE,
    tags=("streaming", "multimodal", "audio", "validation", "dead_letter",
          "pandas_udf"),
)
def wav_ingest_dead_letter_replay(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Route a deterministically-corrupted WAV corpus through the real
    streaming validator and aggregate (status, n, sum_peak_abs,
    sum_zero_crossings) — counts prove the dead-letter routing, sums
    prove the surviving rows decoded to the right samples."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = (with_payload(docs).select("doc_id", "payload")
                .mapInPandas(_build_corrupted,
                             schema="doc_id long, payload binary"))
    good, dead = validate_wav_stream(payloads)
    tagged = (good.select(F.lit("good").alias("status"),
                          "peak_abs", "zero_crossings")
              .unionAll(dead.select(
                  F.concat(F.lit("dead_"), F.col("reason")).alias("status"),
                  F.lit(0).cast("long").alias("peak_abs"),
                  F.lit(0).cast("long").alias("zero_crossings"))))
    return (tagged.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("peak_abs").alias("sum_peak_abs"),
                 F.sum("zero_crossings").alias("sum_zero_crossings"))
            .orderBy("status"))
