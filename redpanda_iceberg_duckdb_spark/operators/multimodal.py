"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas. Binary PPM (P6) decodes for real
via the dependency-free decode_ppm below (exercised end-to-end by the
oracle-checked multimodal_pixel_stats query); other image/audio formats
need libraries absent from this container and stay clearly-marked stubs.
Everything Spark-side — schema, binary columns, batch iteration, UDF
signatures, partitioning — is real and tested.

Pipeline shape for a real 100 TB multimodal corpus:
  parquet(binary payload, metadata struct)
    -> repartition to bound per-task batch bytes (payloads are fat: target
       ~64-128 MB of payload per task, NOT the default row-count heuristics)
    -> mapInPandas(decode + feature-extract)  [Arrow transfer, no JVM copy]
    -> narrow feature columns onward; drop the payload before any shuffle.
Dropping the payload pre-shuffle is the single most important rule: shuffling
raw media bytes is how these pipelines fall over.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

try:  # decode libraries are absent in this environment — gate, don't assume
    from PIL import Image  # type: ignore  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + metadata struct to each document.
    (Here the payload is the UTF-8 text bytes standing in for image bytes;
    in production this column arrives from the lake already binary.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col("text")).alias("n_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Dependency-free binary-PPM (P6) decoder: returns (width, height,
    maxval, raw RGB bytes). Full header grammar — magic, whitespace,
    '#' comments, three ASCII ints, single whitespace before the raster —
    so real P6 files decode, not just the fixture generator's output.
    maxval > 255 (2-byte samples) is rejected explicitly."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("2-byte-sample PPM (maxval > 255) not supported")
    n = w * h * 3
    px = payload[pos:pos + n]
    if len(px) != n:
        raise ValueError(f"raster truncated: want {n} bytes, got {len(px)}")
    return w, h, maxval, px


def decode_image(payload: bytes) -> object:
    """Image decode dispatch: binary PPM (P6) decodes dependency-free via
    decode_ppm; every other format needs PIL/opencv, absent from this
    container, and stays a clearly-marked stub."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if not HAVE_PIL:
        raise NotImplementedError(
            "non-PPM image decode requires PIL; not available in this "
            "environment")
    raise NotImplementedError("wire to PIL.Image.open when available")


def sample_frame_offsets(n_bytes: int, n_frames: int = 4) -> list[int]:
    """Deterministic fake video frame sampler: evenly spaced byte offsets —
    the partition/batch plumbing is identical to real frame sampling."""
    if n_bytes <= 0 or n_frames <= 0:
        return []
    step = max(n_bytes // n_frames, 1)
    return [min(i * step, n_bytes - 1) for i in range(n_frames)]


def extract_byte_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas:
    the exact batch shape a real decoder uses (iterator of pandas frames in,
    iterator out; payload dropped from the output)."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": raw.map(len).astype("int64"),
                "byte_sum": raw.map(lambda b: sum(b) % 2_147_483_647)
                               .astype("int64"),
                "first_byte": raw.map(lambda b: b[0] if b else -1)
                                 .astype("int32"),
                "frame_offsets": raw.map(
                    lambda b: sample_frame_offsets(len(b))),
            })

    schema = ("doc_id long, n_bytes long, byte_sum long, first_byte int, "
              "frame_offsets array<long>")
    return payloads.mapInPandas(features, schema=schema)


@register(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       'application/octet-stream' AS mime
FROM documents
ORDER BY doc_id""",
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — byte length and content digest
    computed on the binary column itself (md5 of UTF-8 bytes == md5 of the
    source text, which is what the oracle checks)."""
    docs = load_table(spark, sf_dir, "documents")
    p = with_payload(docs)
    return p.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.mime").alias("mime"),
    ).orderBy("doc_id")


@register(
    "multimodal_byte_features",
    oracle="""
SELECT doc_id,
       cast(octet_length(encode(text)) AS bigint) AS n_bytes,
       cast(coalesce(list_sum(
           [cast('0x' || substring(hex(encode(text)), 2*i+1, 2) AS bigint)
            FOR i IN range(octet_length(encode(text)))]) % 2147483647, 0)
         AS bigint) AS byte_sum,
       cast(CASE WHEN octet_length(encode(text)) > 0
                 THEN cast('0x' || substring(hex(encode(text)), 1, 2) AS int)
                 ELSE -1 END AS int) AS first_byte,
       CASE WHEN octet_length(encode(text)) <= 0 THEN ''
            ELSE array_to_string(
                [least(i * greatest(octet_length(encode(text)) // 4, 1),
                       octet_length(encode(text)) - 1) FOR i IN range(4)], ',')
       END AS frame_offsets_csv,
       cast(CASE WHEN octet_length(encode(text)) > 0 THEN 4 ELSE 0 END
         AS int) AS n_frames
FROM documents
ORDER BY doc_id""",
    tags=("multimodal", "pandas_udf"),
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full binary pipeline: attach payload -> mapInPandas feature extraction
    -> narrow columns out. The driver-facing output stringifies the
    frame_offsets array (CSV) — array columns break the harness's pandas
    canonicalization — while the library API (extract_byte_features) keeps
    the typed array. The oracle recomputes every byte feature in SQL by
    hex-expanding the UTF-8 blob, so this is a full hash-checked row, not a
    rows-only one."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_byte_features(with_payload(docs))
    return feats.select(
        "doc_id", "n_bytes", "byte_sum", "first_byte",
        F.concat_ws(",", F.transform("frame_offsets",
                                     lambda x: x.cast("string")))
        .alias("frame_offsets_csv"),
        F.size("frame_offsets").alias("n_frames"),
    ).orderBy("doc_id")


_FRAME_LEN = 16   # bytes per sampled frame window
_N_FRAMES = 4

_FRAME_DEDUP_ORACLE = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
           WHERE length(text) > 0),
offs AS (SELECT doc_id, text, n,
                least(i * greatest(n // {_N_FRAMES}, 1), n - 1) AS off
         FROM d, unnest(range({_N_FRAMES})) r(i)),
frames AS (SELECT doc_id, md5(substr(text, off + 1, {_FRAME_LEN}))
                      AS frame_md5
           FROM offs),
agg AS (SELECT frame_md5,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occurrences,
               min(doc_id) AS first_doc
        FROM frames GROUP BY frame_md5)
SELECT frame_md5, n_docs, n_occurrences, first_doc
FROM agg WHERE n_docs > 1
ORDER BY n_docs DESC, frame_md5"""


@register(
    "multimodal_frame_dedup",
    oracle=_FRAME_DEDUP_ORACLE,
    tags=("multimodal", "dedup"),
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level cross-document dedup over binary payloads: sample
    4-frame byte windows per payload at the sample_frame_offsets
    positions (evenly spaced — the video-keyframe stand-in), hash each
    frame, and report frames shared by more than one document — the
    near-storage dedup pass a video/image pipeline runs before feature
    extraction (identical intro frames, watermarks, rebroadcast content).

    The Spark path slices the BINARY column (substring+md5 on bytes,
    map-side, whole-stage codegen); the oracle computes the same windows
    on the source text, which is byte-identical here because the payload
    is the UTF-8 encoding of ASCII text (multimodal.with_payload). One
    explode (bounded x4 fan-out), one hash aggregate keyed by frame
    hash — at 100 TB this is a single shuffle of 16-byte digests, never
    of payloads."""
    docs = load_table(spark, sf_dir, "documents")
    p = with_payload(docs).select(
        "doc_id", "payload", F.length("payload").alias("n")).filter(
        F.col("n") > 0)
    offs = p.select(
        "doc_id", "payload",
        F.explode(F.expr(
            f"transform(sequence(0, {_N_FRAMES - 1}), "
            f"i -> least(i * greatest(n div {_N_FRAMES}, 1), n - 1))"))
         .alias("off"))
    frames = offs.select(
        "doc_id",
        F.md5(F.expr(f"substring(payload, off + 1, {_FRAME_LEN})"))
         .alias("frame_md5"))
    return (frames.groupBy("frame_md5")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("n_docs") > 1)
            .select("frame_md5", "n_docs", "n_occurrences", "first_doc")
            .orderBy(F.desc("n_docs"), "frame_md5"))


_IMG_W, _IMG_H = 8, 4
_IMG_BYTES = _IMG_W * _IMG_H * 3     # 96 raster bytes per fixture image

_PIXEL_ORACLE = f"""
WITH b AS (SELECT doc_id, encode(text) AS eb,
                  octet_length(encode(text)) AS n FROM documents),
px AS (SELECT doc_id,
              [CASE WHEN i < n
                    THEN cast('0x' || substring(hex(eb), 2*i+1, 2) AS bigint)
                    ELSE 0 END FOR i IN range({_IMG_BYTES})] AS p
       FROM b)
SELECT doc_id,
       cast({_IMG_W} AS int) AS width,
       cast({_IMG_H} AS int) AS height,
       cast(list_sum(p) AS bigint) AS px_sum,
       cast(list_sum([p[3*j+1] FOR j IN range({_IMG_W * _IMG_H})])
            AS double) / {_IMG_W * _IMG_H} AS r_avg,
       cast(list_sum([p[3*j+2] FOR j IN range({_IMG_W * _IMG_H})])
            AS double) / {_IMG_W * _IMG_H} AS g_avg,
       cast(list_sum([p[3*j+3] FOR j IN range({_IMG_W * _IMG_H})])
            AS double) / {_IMG_W * _IMG_H} AS b_avg
FROM px ORDER BY doc_id"""


def ppm_fixture(text_bytes: bytes) -> bytes:
    """Deterministic byte-image: an 8x4 P6 whose raster is the payload's
    first 96 bytes zero-padded — same bytes both engines can reason about,
    with a comment line so the decoder's comment handling is exercised on
    every row."""
    px = text_bytes[:_IMG_BYTES].ljust(_IMG_BYTES, b"\x00")
    return (b"P6\n# deterministic byte-image fixture\n"
            + f"{_IMG_W} {_IMG_H}\n255\n".encode("ascii") + px)


@register(
    "multimodal_pixel_stats",
    oracle=_PIXEL_ORACLE,
    tags=("multimodal", "pandas_udf"),
)
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-measure over byte images: each document's payload becomes
    a deterministic 8x4 P6 fixture, goes through the REAL dependency-free
    PPM decoder (decode_ppm — full header grammar, not the generator
    inverted), and per-channel pixel statistics come off the decoded
    raster only. The oracle recomputes the stats from the same bytes in
    SQL, so a green row proves the decode path end to end. Channel means
    are integer sums divided by 32 (2^5) — exact doubles, no rounding
    hazard. Scale stance: decode + stats are one Arrow-batched
    mapInPandas pass; payloads never cross a shuffle (narrow stats out)."""
    from collections.abc import Iterator as _It

    docs = load_table(spark, sf_dir, "documents")
    p = with_payload(docs).select("doc_id", "payload")

    def gen(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np
        npx = float(_IMG_W * _IMG_H)
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _mx, px = decode_ppm(ppm_fixture(bytes(payload)))
                arr = (np.frombuffer(px, dtype=np.uint8)
                       .astype(np.int64).reshape(-1, 3))
                recs.append((int(doc_id), w, h, int(arr.sum()),
                             float(arr[:, 0].sum()) / npx,
                             float(arr[:, 1].sum()) / npx,
                             float(arr[:, 2].sum()) / npx))
            yield pd.DataFrame(recs, columns=[
                "doc_id", "width", "height", "px_sum",
                "r_avg", "g_avg", "b_avg"])

    schema = ("doc_id long, width int, height int, px_sum long, "
              "r_avg double, g_avg double, b_avg double")
    return p.mapInPandas(gen, schema=schema).orderBy("doc_id")
