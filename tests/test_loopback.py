"""The reference's bidirectional cycle (SURVEY.md section 0, CLAUDE.md:105-117):
trades -> analytics -> published as keyed JSON -> re-ingested as a second
table -> re-queried (Q4/Q5 shapes). Here end-to-end with the file-backed wire
(no broker in CI; sources/kafka.py supplies the identical Kafka options)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from redpanda_iceberg_duckdb_spark.functions import davg, iso_ts
from redpanda_iceberg_duckdb_spark.generator import trades_df
from redpanda_iceberg_duckdb_spark.sources import kafka as ksrc
from redpanda_iceberg_duckdb_spark.streaming import ingest

ANALYTICS_SCHEMA = T.StructType([
    T.StructField("symbol", T.StringType()),
    T.StructField("trade_count", T.LongType()),
    T.StructField("avg_price", T.DoubleType()),
    T.StructField("min_price", T.DoubleType()),
    T.StructField("max_price", T.DoubleType()),
    T.StructField("total_volume", T.LongType()),
    T.StructField("buy_count", T.LongType()),
    T.StructField("sell_count", T.LongType()),
    T.StructField("first_trade_time", T.StringType()),
    T.StructField("last_trade_time", T.StringType()),
])


def test_bidirectional_cycle(spark, tmp_path):
    # 1. ingest leg: 2000 seeded trades -> first table
    trades = trades_df(spark, count=2_000, seed=42)
    trades_path = str(tmp_path / "trades_tbl")
    trades.write.parquet(trades_path)

    # 2. analytics leg: reference Q1 (query_and_publish.py:107-122)
    t = spark.read.parquet(trades_path)
    analytics = (
        t.groupBy("symbol")
        .agg(F.count(F.lit(1)).alias("trade_count"),
             davg("price", "avg_price"),
             F.round(F.min("price"), 2).alias("min_price"),
             F.round(F.max("price"), 2).alias("max_price"),
             F.sum("qty").alias("total_volume"),
             F.count(F.when(F.col("side") == "BUY", 1)).alias("buy_count"),
             F.count(F.when(F.col("side") == "SELL", 1)).alias("sell_count"),
             iso_ts(F.min("ts_event"), "first_trade_time"),
             iso_ts(F.max("ts_event"), "last_trade_time"))
    )

    # 3. publish leg: keyed JSON wire shape (key=symbol, S2 parity)
    wire = ksrc.encode_keyed_json(analytics, "symbol")
    wire_path = str(tmp_path / "wire")
    wire.write.parquet(wire_path)

    # 4. re-ingest leg: wire -> schema-validated second table
    wire_back = spark.read.parquet(wire_path)
    good, bad = ingest.ingest_kafka_shaped(wire_back, ANALYTICS_SCHEMA)
    assert bad.count() == 0
    second_path = str(tmp_path / "analytics_tbl")
    good.write.parquet(second_path)

    # 5. re-query leg: Q4 re-aggregation + Q5 top-k over the second table
    a = spark.read.parquet(second_path)
    assert a.count() == 8  # 8 symbols (e2e.sh:147-148)
    q4 = a.agg(F.count(F.lit(1)).alias("rows"),
               F.sum("trade_count").alias("total")).collect()[0]
    assert q4.rows == 8 and q4.total == 2_000
    q5 = (a.select("symbol", "trade_count", "avg_price", "total_volume")
          .orderBy(F.desc("total_volume")).limit(5).collect())
    assert len(q5) == 5
    assert q5[0].total_volume >= q5[-1].total_volume
    # round-trip fidelity: per-symbol values survive JSON encode/decode
    orig = {r.symbol: r for r in analytics.collect()}
    back = {r.symbol: r for r in a.collect()}
    for s in orig:
        assert orig[s].avg_price == back[s].avg_price
        assert orig[s].first_trade_time == back[s].first_trade_time
