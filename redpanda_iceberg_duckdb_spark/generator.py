"""Deterministic trade-data generator — semantic replica of the reference's
producer (/root/reference/redpanda/producer.py:23-49, 67-78): seeded
Mersenne-Twister draws, deterministic UUIDv4 from the row index, fixed base
time 2025-01-15T10:00:00 plus i seconds, 100-char alnum padding.

Generation stays in driver-side Python on purpose (SURVEY.md section 2.8 F9):
Spark's F.rand is partition-order-dependent and cannot reproduce Python's RNG
sequence, and byte-exact corpus parity with the reference is the point.
For big synthetic corpora, shard by seed: one task per (seed, range) via
spark.range(...).mapInPandas, each shard seeded independently — same
determinism, no driver bottleneck (see sharded_trades()).
"""

from __future__ import annotations

import random
import string
import uuid
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, types as T

SYMBOLS = ["AAPL", "GOOGL", "MSFT", "AMZN", "TSLA", "NVDA", "META", "BRK.B"]
SIDES = ["BUY", "SELL"]
BASE_TIME = datetime(2025, 1, 15, 10, 0, 0)

TRADE_SCHEMA = T.StructType([
    T.StructField("trade_id", T.StringType(), False),
    T.StructField("symbol", T.StringType(), False),
    T.StructField("price", T.DoubleType(), False),
    T.StructField("qty", T.IntegerType(), False),
    T.StructField("side", T.StringType(), False),
    T.StructField("ts_event", T.TimestampType(), False),
    T.StructField("notes", T.StringType(), True),
])

_ALNUM = string.ascii_letters + string.digits


def generate_trade(i: int, base_time: datetime, rng: random.Random) -> dict:
    """One trade row; draw order matches producer.py:23-49 exactly
    (symbol, price, qty, side, padding)."""
    return {
        "trade_id": str(uuid.UUID(int=i, version=4)),
        "symbol": rng.choice(SYMBOLS),
        "price": round(rng.uniform(50.0, 500.0), 2),
        "qty": rng.randint(1, 1000),
        "side": rng.choice(SIDES),
        "ts_event": base_time + timedelta(seconds=i),
        "notes": "".join(rng.choices(_ALNUM, k=100)),
    }


def generate_trades(count: int = 20_000, seed: int = 42,
                    base_time: datetime = BASE_TIME) -> list[dict]:
    rng = random.Random(seed)
    return [generate_trade(i, base_time, rng) for i in range(count)]


def trades_df(spark: SparkSession, count: int = 20_000, seed: int = 42) -> DataFrame:
    """Reference-parity trades as a DataFrame (driver-side generation,
    Arrow-batched into executors)."""
    return spark.createDataFrame(generate_trades(count, seed), schema=TRADE_SCHEMA)


def sharded_trades(spark: SparkSession, count: int, seed: int = 42,
                   rows_per_shard: int = 100_000) -> DataFrame:
    """Scale path: generate in parallel, one independently-seeded RNG per
    shard (seed, shard_id) — deterministic for a fixed sharding, no driver
    bottleneck. Not byte-identical to the sequential reference stream (each
    shard has its own RNG); use trades_df for reference-exact corpora."""
    import pandas as pd

    n_shards = (count + rows_per_shard - 1) // rows_per_shard
    shards = spark.range(n_shards).repartition(n_shards)

    def gen(batches):
        for pdf in batches:
            for shard in pdf["id"]:
                rng = random.Random(seed * 1_000_003 + int(shard))
                start = int(shard) * rows_per_shard
                n = min(rows_per_shard, count - start)
                rows = [generate_trade(start + j, BASE_TIME, rng)
                        for j in range(n)]
                yield pd.DataFrame(rows)

    return shards.mapInPandas(gen, schema=TRADE_SCHEMA)
