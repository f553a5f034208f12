"""Spark 4 Python DataSource surface: the deterministic trade generator
exposed as a REGISTERED `spark.read.format("trades")` source, and the
FIDX frame container as a binary-file batch source — the reference's
'producer feeds the engine' contract (redpanda/producer.py:67-78)
re-expressed through Spark's pluggable source API instead of a broker.

Why this exists: everything else in sources/ configures JVM connectors
(Kafka wire codec, Iceberg catalogs); the Python DataSource API is the
idiomatic Spark-4 way to add a NEW source without a JVM jar, and a
complete engine should demonstrate it. Each partition of the trades
source generates its shard with an independently-seeded RNG
(generator.sharded_trades semantics — deterministic for a fixed
sharding, parallel, no driver bottleneck); `reader.partitions()` is the
planner-visible parallelism contract.

Scale stance (100 TB): partitions() returns one InputPartition per
shard, so a 1000-executor cluster generates 1000-way parallel;
generation is pure CPU per partition with zero shuffle.
"""

from __future__ import annotations

import random
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

from pyspark.sql.datasource import SimpleDataSourceStreamReader

from ..generator import BASE_TIME, TRADE_SCHEMA, generate_trade


class _Shard(InputPartition):
    def __init__(self, shard: int, start: int, n: int, seed: int):
        self.shard, self.start, self.n, self.seed = shard, start, n, seed


class TradesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.count = int(options.get("count", 20_000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_shard = int(options.get("rowsPerShard", 5_000))

    def partitions(self) -> Sequence[InputPartition]:
        rps = self.rows_per_shard
        n_shards = max(1, (self.count + rps - 1) // rps)
        return [_Shard(s, s * rps, min(rps, self.count - s * rps),
                       self.seed) for s in range(n_shards)]

    def read(self, part: _Shard) -> Iterator[tuple]:
        rng = random.Random(part.seed * 1_000_003 + part.shard)
        for j in range(part.n):
            r = generate_trade(part.start + j, BASE_TIME, rng)
            yield (r["trade_id"], r["symbol"], r["price"], r["qty"],
                   r["side"], r["ts_event"], r["notes"])


class TradesStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch replica of the reference producer's trade stream
    (producer.py:67-78 emits rows continuously; here offsets are row
    indices). Each micro-batch emits up to `rowsPerBatch` rows; the
    source is exhausted at `count` (latestOffset stops advancing, so
    `processAllAvailable()` terminates in tests). Rows are seeded
    PER-ROW (Random(seed*1_000_003 + i)) so `readBetweenOffsets` —
    Spark's replay-after-failure contract — regenerates any offset
    range bit-identically without carrying RNG state between batches."""

    def __init__(self, options: dict):
        self.count = int(options.get("count", 20_000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsPerBatch", 1_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # A LIST, not a generator: Spark's stream-reader prefetch cache
        # copy.copy()s the returned iterator for replay, which a generator
        # cannot survive (and a micro-batch is rowsPerBatch-bounded anyway).
        out = []
        for i in range(start, end):
            rng = random.Random(self.seed * 1_000_003 + i)
            r = generate_trade(i, BASE_TIME, rng)
            out.append((r["trade_id"], r["symbol"], r["price"], r["qty"],
                        r["side"], r["ts_event"], r["notes"]))
        return out

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.rows_per_batch, self.count)
        return iter(self._rows(lo, hi)), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["i"], end["i"]))


class TradesDataSource(DataSource):
    """`spark.read.format("trades").option("count", N).load()` (batch) or
    `spark.readStream.format("trades")...` (micro-batch stream).

    Seeding DIVERGES between the two paths by design: batch seeds one RNG
    per shard and advances it across the shard's rows (bit-compatible
    with generator.sharded_trades, whose parity fixture pins that
    contract), while the stream seeds a fresh RNG per row so any offset
    range replays bit-identically without carrying RNG state between
    micro-batches. Identical (count, seed) options therefore produce
    DIFFERENT row contents across read vs readStream; pick per path, not
    across paths."""

    @classmethod
    def name(cls) -> str:
        return "trades"

    def schema(self) -> T.StructType:
        return TRADE_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return TradesReader(self.options)

    def simpleStreamReader(self, schema: T.StructType
                           ) -> SimpleDataSourceStreamReader:
        return TradesStreamReader(self.options)


_FIDX_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


class FidxReader(DataSourceReader):
    """One InputPartition per container FILE (path glob from the `path`
    option); each partition walks its container with the REAL decoder and
    emits (doc_id, frame_idx, frame) rows — the 'media container as a
    first-class source' shape."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        import glob

        return [InputPartition(p)
                for p in sorted(glob.glob(f"{self.path}/*.fidx"))]

    def read(self, part: InputPartition) -> Iterator[tuple]:
        import os

        from ..operators.multimodal14 import decode_frames

        # An empty partitions() list makes Spark call read(None) once;
        # an empty directory must yield an empty frame, not AttributeError.
        if part is None or getattr(part, "value", None) is None:
            return

        path = part.value
        doc_id = int(os.path.basename(path).split(".")[0])
        with open(path, "rb") as f:
            payload = f.read()
        for i, frame in enumerate(decode_frames(payload)):
            yield (doc_id, i, frame)


class FidxDataSource(DataSource):
    """`spark.read.format("fidx").option("path", dir).load()`."""

    @classmethod
    def name(cls) -> str:
        return "fidx"

    def schema(self) -> T.StructType:
        return _FIDX_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return FidxReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotent registration of both sources on a session."""
    spark.dataSource.register(TradesDataSource)
    spark.dataSource.register(FidxDataSource)
