"""Kafka source/sink wiring — reference parity for SURVEY.md section 2.1 S1-S3, S7.

The reference produces keyed JSON with acks=all + snappy
(/root/reference/redpanda/producer.py:81-107) and consumes topics back; in
Spark both directions are the built-in kafka connector plus from_json/to_json.
No broker exists in CI, so these builders return reader/writer *options* and
column transforms that tests exercise against file-backed frames; wiring them
to .format("kafka") is a one-liner at deploy time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def reader_options(brokers: str, topic: str, *,
                   starting_offsets: str = "earliest") -> dict[str, str]:
    """Options for spark.read[Stream].format('kafka') (S3/S7 parity)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }


def writer_options(brokers: str, topic: str) -> dict[str, str]:
    """Options for df.write[Stream].format('kafka') (S1/S2 parity: acks=all,
    snappy compression — producer.py:81-88)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "kafka.acks": "all",
        "kafka.compression.type": "snappy",
    }


def encode_keyed_json(df: DataFrame, key_col: str) -> DataFrame:
    """Rows -> Kafka wire shape: key = UTF-8 key column, value = JSON object
    of all columns (producer.py:98-100 semantics)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
    )


def decode_json_values(df: DataFrame, schema: T.StructType,
                       ts_format: str | None = None) -> DataFrame:
    """Kafka wire shape -> typed rows: parse value JSON against the declared
    schema (the Spark analogue of Redpanda's value_schema_latest mode,
    SURVEY.md section 2.1 S3). Malformed values land in the _corrupt field
    (from_json yields a struct of nulls, not a null struct, so a corrupt-record
    column is the reliable malformed signal); split with split_malformed()."""
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    if ts_format:
        opts["timestampFormat"] = ts_format
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType(), True)])
    return df.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(F.col("value").cast("string"), with_corrupt, opts).alias("data"),
        F.col("value").cast("string").alias("_raw"),
    )


def split_malformed(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter) split — St5 schema enforcement at ingest."""
    ok = F.col("data").isNotNull() & F.col("data._corrupt").isNull()
    good = parsed.filter(ok).select("data.*").drop("_corrupt")
    bad = parsed.filter(~ok).select("_key", "_raw")
    return good, bad
