"""Generator parity tests: determinism, reference constants, and — the real
check — the native-schema Q1 analytics over generated trades hash-matched
against DuckDB running the reference's own SQL shape on the same parquet."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.functions import davg, davg_sql, iso_ts, iso_ts_sql
from redpanda_iceberg_duckdb_spark.generator import (
    SYMBOLS, generate_trades, trades_df,
)


def test_determinism_and_constants():
    a = generate_trades(200, seed=42)
    b = generate_trades(200, seed=42)
    assert a == b
    c = generate_trades(200, seed=7)
    assert a != c
    assert all(r["symbol"] in SYMBOLS for r in a)
    assert all(50.0 <= r["price"] < 500.0 for r in a)
    assert all(1 <= r["qty"] <= 1000 for r in a)
    assert all(len(r["notes"]) == 100 for r in a)
    # producer.py:26 — deterministic UUIDv4 layout from the row index
    assert a[0]["trade_id"] == "00000000-0000-4000-8000-000000000000"
    assert a[1]["ts_event"].second == 1


def test_native_q1_vs_duckdb(spark, tmp_path):
    """Reference Q1 (query_and_publish.py:107-122) on the native trade schema,
    Spark vs DuckDB over identical parquet."""
    df = trades_df(spark, count=2_000, seed=42)
    pq = str(tmp_path / "trades.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)

    res = (
        spark.read.parquet(pq)
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("trade_count"),
            davg("price", "avg_price"),
            F.round(F.min("price"), 2).alias("min_price"),
            F.round(F.max("price"), 2).alias("max_price"),
            F.sum("qty").alias("total_volume"),
            F.count(F.when(F.col("side") == "BUY", 1)).alias("buy_count"),
            F.count(F.when(F.col("side") == "SELL", 1)).alias("sell_count"),
            iso_ts(F.min("ts_event"), "first_trade_time"),
            iso_ts(F.max("ts_event"), "last_trade_time"),
        )
        .orderBy(F.desc("total_volume"))
    )
    srows = [tuple(r) for r in res.collect()]
    assert len(srows) == 8  # one row per symbol (e2e.sh:147-148)

    con = duckdb.connect()
    orows = con.execute(f"""
        SELECT symbol, count(*) AS trade_count,
               {davg_sql('price', 'avg_price')},
               round(min(price), 2) AS min_price,
               round(max(price), 2) AS max_price,
               cast(sum(qty) AS bigint) AS total_volume,
               count(CASE WHEN side = 'BUY' THEN 1 END) AS buy_count,
               count(CASE WHEN side = 'SELL' THEN 1 END) AS sell_count,
               {iso_ts_sql('min(ts_event)', 'first_trade_time')},
               {iso_ts_sql('max(ts_event)', 'last_trade_time')}
        FROM read_parquet('{pq}/*.parquet')
        GROUP BY symbol ORDER BY total_volume DESC""").fetchall()
    assert srows == orows


def test_sharded_generator(spark):
    from redpanda_iceberg_duckdb_spark.generator import sharded_trades

    df = sharded_trades(spark, count=250, seed=42, rows_per_shard=100)
    rows = df.collect()
    assert len(rows) == 250
    assert len({r.trade_id for r in rows}) == 250
