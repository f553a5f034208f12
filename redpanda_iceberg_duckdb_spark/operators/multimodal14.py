"""Frame-indexed container plumbing — the video-shaped sibling of the PPM
image (multimodal.py) and RIFF/WAV audio (multimodal13.py) paths. Same
design rules: a deterministic byte fixture, a REAL dependency-free
container decoder (an offset/size frame table the decoder must validate
and walk — the part AVI/MP4 readers get wrong), and frame SAMPLING (every
2nd frame) computed only from the decoded bytes, so a green row proves
header parse + table walk + bounds checks + sampling end to end.

Fixture layout (little-endian):
    'FIDX' | u16 n_frames | n_frames x (u32 offset, u32 size) | frame blobs
Frames partition the payload's text bytes into 24-byte chunks, capped at
8 frames with the LAST frame taking the remainder (so every byte belongs
to exactly one frame — the oracle can recompute per-byte frame indices
from text length alone).

Per-doc stats: n_frames, n_sampled (frames 0,2,4,..), sampled_bytes
(sum of sampled frames' sizes), sampled_checksum (sum of sampled frames'
byte values — exact integers). The DuckDB oracle hex-expands the UTF-8
text and reproduces all four from the chunking arithmetic.

Real codecs (H.264 etc.) stay honestly gated exactly like non-PPM images;
the CONTAINER math here is real and the Spark plumbing (binary column in,
one Arrow mapInPandas pass, narrow numeric columns out, payloads never
shuffled) is the production shape.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .multimodal import with_payload

_FRAME = 24
_MAX_FRAMES = 8


def frame_container(text_bytes: bytes) -> bytes:
    """Canonical frame-indexed container over the payload bytes (module
    docstring layout). Empty payloads get one empty frame."""
    ln = len(text_bytes)
    n = min(_MAX_FRAMES, max(1, -(-ln // _FRAME)))
    sizes = [_FRAME] * (n - 1) + [ln - _FRAME * (n - 1)]
    header_len = 4 + 2 + 8 * n
    table = b""
    off = header_len
    for s in sizes:
        table += struct.pack("<II", off, s)
        off += s
    return b"FIDX" + struct.pack("<H", n) + table + text_bytes


def decode_frames(payload: bytes) -> list[bytes]:
    """Real container walk: magic, frame count, offset/size table with
    bounds validation. Raises on malformed containers."""
    if len(payload) < 6 or payload[:4] != b"FIDX":
        raise ValueError("not a FIDX container")
    n = struct.unpack("<H", payload[4:6])[0]
    if n == 0 or len(payload) < 6 + 8 * n:
        raise ValueError("truncated frame table")
    frames = []
    for i in range(n):
        off, size = struct.unpack("<II", payload[6 + 8 * i: 14 + 8 * i])
        if off + size > len(payload):
            raise ValueError("frame out of bounds")
        frames.append(payload[off: off + size])
    return frames


# Per-byte value at 0-based position p from the hex-expanded UTF-8 text.
_BYTE_AT = ("cast('0x' || substring(hex(encode(text)), 2 * p + 1, 2) "
            "AS bigint)")

_FIDX_ORACLE = f"""
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS ln, text
           FROM documents),
f AS (SELECT doc_id,
             least({_MAX_FRAMES}, greatest(1, (ln + {_FRAME} - 1) // {_FRAME}))
               AS nf
      FROM d),
s AS (SELECT doc_id, nf,
             (nf + 1) // 2 AS nsamp,
             CASE WHEN ln = 0 THEN 0 ELSE
               list_sum([CASE WHEN least(p // {_FRAME}, nf - 1) % 2 = 0
                              THEN 1 ELSE 0 END FOR p IN range(ln)])
             END AS sbytes,
             CASE WHEN ln = 0 THEN 0 ELSE
               list_sum([CASE WHEN least(p // {_FRAME}, nf - 1) % 2 = 0
                              THEN {_BYTE_AT} ELSE 0 END
                         FOR p IN range(ln)])
             END AS schk
      FROM f JOIN d USING (doc_id))
SELECT doc_id, cast(nf AS bigint) AS n_frames,
       cast(nsamp AS bigint) AS n_sampled,
       cast(sbytes AS bigint) AS sampled_bytes,
       cast(schk AS bigint) AS sampled_checksum
FROM s ORDER BY doc_id"""


@register(
    "multimodal_frame_sample",
    oracle=_FIDX_ORACLE,
    tags=("multimodal", "video", "pandas_udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the frame container and sample every 2nd frame (module
    docstring): (doc_id, n_frames, n_sampled, sampled_bytes,
    sampled_checksum), all computed from the DECODED frames only."""
    docs = load_table(spark, sf_dir, "documents")
    p = with_payload(docs).select("doc_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_frames(frame_container(bytes(payload)))
                sampled = frames[::2]
                recs.append((int(doc_id), len(frames), len(sampled),
                             sum(len(fr) for fr in sampled),
                             sum(sum(fr) for fr in sampled)))
            yield pd.DataFrame(recs, columns=[
                "doc_id", "n_frames", "n_sampled", "sampled_bytes",
                "sampled_checksum"])

    out = p.mapInPandas(gen, schema=(
        "doc_id long, n_frames long, n_sampled long, sampled_bytes long, "
        "sampled_checksum long"))
    return out.orderBy("doc_id")
