"""Audio-modality ingest validation: the St5 dead-letter contract
(streaming/ingest.validate_stream, sources/kafka.split_malformed — the
schema enforcement the reference applies to JSON at the broker,
/root/reference/validation/e2e.sh:67-105 analogue) applied to binary WAV
payloads. A malformed container is the audio equivalent of a malformed
JSON value: it must land in a dead-letter side with a reason, never crash
the micro-batch and never silently pass.

The validator is the REAL RIFF chunk-walk decoder
(operators/multimodal13.decode_wav) run inside one Arrow-batched
mapInPandas pass; good rows come out as narrow decoded-stat columns
(payloads never cross a shuffle), dead rows as (doc_id, reason). The same
transform works on a batch frame and a streaming frame — the replay query
(operators/wav_ingest14.py) and the streaming test drive the identical
code path.

Scale stance (100 TB): decode+validate is map-only (no shuffle, no state);
dead-letter routing is two filters over one mapInPandas output, so the
stream stays a single narrow stage before its sinks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# decode_wav ValueError messages -> stable dead-letter reason codes
# (the _REASONS table is the contract: a new decoder error must be added
# here or it surfaces as 'decode_error', still dead-lettered).
_REASONS = {
    "not a RIFF/WAVE payload": "not_riff",
    "missing fmt or data chunk": "missing_chunk",
    "only 16-bit mono PCM supported": "unsupported_format",
    "truncated fmt chunk": "truncated_fmt",
}

_OUT_SCHEMA = ("doc_id long, n_samples long, duration_us long, "
               "peak_abs long, zero_crossings long, sum_sq long, "
               "reason string")


def _decode_tag_batches(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
    import numpy as np

    # Imported lazily: operators/__init__ imports the replay operator,
    # which imports this module — a module-level import of the decoder
    # would close that cycle during package init.
    from ..operators.multimodal13 import decode_wav

    for pdf in batches:
        recs = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                rate, n, data = decode_wav(bytes(payload))
            except ValueError as ex:
                recs.append((int(doc_id), None, None, None, None, None,
                             _REASONS.get(str(ex), "decode_error")))
                continue
            s = np.frombuffer(data, dtype="<i2").astype(np.int64)
            recs.append((
                int(doc_id), n, n * 1_000_000 // rate,
                int(np.abs(s).max()) if n else 0,
                int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0,
                int((s * s).sum()), None))
        yield pd.DataFrame(recs, columns=[
            "doc_id", "n_samples", "duration_us", "peak_abs",
            "zero_crossings", "sum_sq", "reason"])


def validate_wav_stream(frame: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter) split for a (doc_id, payload binary) frame —
    batch or streaming. Good rows are decoded PCM stats; dead rows carry
    the reason code. The audio St5: reject-on-container-mismatch."""
    tagged = frame.select("doc_id", "payload").mapInPandas(
        _decode_tag_batches, schema=_OUT_SCHEMA)
    good = (tagged.filter(F.col("reason").isNull())
            .select("doc_id", "n_samples", "duration_us", "peak_abs",
                    "zero_crossings", "sum_sq"))
    dead = tagged.filter(F.col("reason").isNotNull()).select(
        "doc_id", "reason")
    return good, dead
