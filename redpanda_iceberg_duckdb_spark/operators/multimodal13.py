"""Audio-modality plumbing: decode-and-measure over WAV/PCM byte payloads,
the audio sibling of multimodal.py's PPM image path. Same design rules:
a deterministic byte fixture both engines can reason about, a REAL
dependency-free decoder (full RIFF chunk grammar — not the generator
inverted), and per-row signal statistics computed only from the decoded
samples, so a green row proves the decode path end to end.

Fixture: each document's payload bytes become a canonical 16-bit mono
8 kHz WAV — 'RIFF' header, a LIST chunk the decoder must SKIP (chunk
walking is the part naive parsers get wrong), an 18-byte extended fmt
chunk (cbSize=0 — and odd-size padding rules honored), and a 'data'
chunk whose 128 bytes are the payload's first 128 zero-padded. The
decoder walks chunks by (id, size, odd-padding), validates PCM/mono/16,
and returns the int16-LE samples.

Stats are exact integers until the final division: duration in micros
(n*1e6 div rate), peak = max |s|, zero crossings (strict sign product
< 0 — zeros never cross, stated so both engines agree), and RMS =
sqrt(sum s^2 / n) (IEEE sqrt is correctly rounded, so the doubles are
bit-identical). The DuckDB oracle rebuilds the same int16 samples by
hex-expanding the UTF-8 blob (the multimodal_byte_features idiom) and
recomputes every stat in SQL.

Scale stance (100 TB): decode + stats are one Arrow-batched mapInPandas
pass; payloads never cross a shuffle (narrow numeric columns out).
Real audio (MP3/FLAC/Opus) stays honestly gated the way non-PPM images
are (multimodal.decode_image) — the container grammar here is real, the
codecs are not in this sandbox.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .multimodal import with_payload

_SR = 8000               # fixture sample rate (Hz)
_N_SAMP = 64             # samples per fixture
_DATA_BYTES = _N_SAMP * 2


def wav_fixture(text_bytes: bytes) -> bytes:
    """Canonical PCM WAV from a payload's first 128 bytes (module
    docstring): RIFF(WAVE) + skippable LIST chunk + 18-byte fmt + data."""
    data = text_bytes[:_DATA_BYTES].ljust(_DATA_BYTES, b"\x00")
    list_chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = struct.pack("<HHIIHHH", 1, 1, _SR, _SR * 2, 2, 16, 0)
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data_chunk = b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + list_chunk + fmt_chunk + data_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, bytes]:
    """Real RIFF walk: (sample_rate, n_samples, raw int16-LE data). Raises
    on non-RIFF, non-PCM, non-mono, non-16-bit, or a missing chunk."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    end = min(8 + struct.unpack("<I", payload[4:8])[0], len(payload))
    rate = bits = channels = fmt_tag = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)       # odd chunk sizes are padded
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if (fmt_tag, channels, bits) != (1, 1, 16):
        raise ValueError("only 16-bit mono PCM supported")
    return rate, len(data) // 2, data


# int16-LE sample j from the hex-expanded blob, zero-padded past the text.
_DUCK_SAMPLE = """
[CASE WHEN 2*j + 1 < octet_length(encode(text))
      THEN cast('0x' || substring(hex(encode(text)), 4*j+1, 2) AS bigint)
           + 256 * cast('0x' || substring(hex(encode(text)), 4*j+3, 2)
                        AS bigint)
      WHEN 2*j < octet_length(encode(text))
      THEN cast('0x' || substring(hex(encode(text)), 4*j+1, 2) AS bigint)
      ELSE 0 END FOR j IN range({n})]
""".strip()

_WAV_ORACLE = f"""
WITH raw AS (SELECT doc_id,
                    [CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
                     FOR u IN {_DUCK_SAMPLE.format(n=_N_SAMP)}] AS s
             FROM documents)
SELECT doc_id,
       cast({_N_SAMP} AS bigint) AS n_samples,
       cast({_N_SAMP} * 1000000 // {_SR} AS bigint) AS duration_us,
       cast(list_max([abs(x) FOR x IN s]) AS bigint) AS peak_abs,
       cast(list_sum([CASE WHEN s[j+1] * s[j+2] < 0 THEN 1 ELSE 0 END
                      FOR j IN range({_N_SAMP - 1})]) AS bigint)
         AS zero_crossings,
       round(sqrt(cast(list_sum([x * x FOR x IN s]) AS double)
                  / {_N_SAMP}), 6) AS rms
FROM raw ORDER BY doc_id"""


@register(
    "multimodal_wav_stats",
    oracle=_WAV_ORACLE,
    tags=("multimodal", "audio", "pandas_udf"),
)
def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PCM signal statistics off the REAL WAV decode
    (module docstring): n_samples, duration_us, peak_abs, zero_crossings,
    rms — all from the decoded int16 stream only."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")
    p = with_payload(docs).select("doc_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n, data = decode_wav(wav_fixture(bytes(payload)))
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                recs.append((
                    int(doc_id), n, n * 1_000_000 // rate,
                    int(np.abs(s).max()) if n else 0,
                    int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0,
                    int((s * s).sum())))
            yield pd.DataFrame(recs, columns=[
                "doc_id", "n_samples", "duration_us", "peak_abs",
                "zero_crossings", "sum_sq"])

    schema = ("doc_id long, n_samples long, duration_us long, "
              "peak_abs long, zero_crossings long, sum_sq long")
    out = p.mapInPandas(gen, schema=schema)
    # Final rounding in Spark SQL (half-away, = DuckDB's round), from the
    # exact integer sum of squares the UDF emits — not Python's round()
    # (banker's) inside the batch.
    return (out.select(
        "doc_id", "n_samples", "duration_us", "peak_abs", "zero_crossings",
        F.round(F.sqrt(F.col("sum_sq").cast("double")
                       / F.col("n_samples")), 6).alias("rms"))
        .orderBy("doc_id"))
