"""Streaming ingest job: JSON records -> schema validation -> columnar table
append. This is the Spark re-expression of the reference's Kafka->Iceberg
broker ingest (SURVEY.md section 2.1 S3, section 2.9 St1-St6):

  reference                         | here
  ----------------------------------+----------------------------------
  Redpanda value_schema_latest      | from_json(declared StructType)
  reject-on-schema-mismatch         | dead-letter split (St5)
  Parquet flush + Iceberg snapshot  | parquet/iceberg sink + checkpoint
  iceberg_target_lag_ms=10000       | trigger(processingTime='10 seconds')
  at-least-once                     | exactly-once (checkpoint + atomic sink)

Sources are pluggable: file JSON dirs in CI, Kafka in production (same
decode/split transform — sources/kafka.py). Checkpointing makes restarts
exactly-once; at 100 TB/day the knobs are maxFilesPerTrigger /
maxOffsetsPerTrigger for batch sizing, nothing structural changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T
from pyspark.sql.streaming import StreamingQuery

from ..sources.kafka import split_malformed
from pyspark.sql import functions as F


def read_json_stream(spark: SparkSession, input_dir: str,
                     schema: T.StructType, *,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-backed JSON stream with a declared schema (never inferred —
    SURVEY.md section 1 'schema system: fixed, declared')."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # PERMISSIVE + _corrupt_record lets the dead-letter split observe
    # malformed lines instead of dropping them silently.
    return reader.option("mode", "PERMISSIVE").json(input_dir)


def validate_stream(raw: DataFrame,
                    required: list[str]) -> tuple[DataFrame, DataFrame]:
    """Schema enforcement (St5): rows missing any required field go to the
    dead-letter side; the good side is append-ready."""
    ok = F.lit(True)  # empty required list => every row is valid
    for c in required:
        ok = ok & F.col(c).isNotNull()
    good = raw.filter(ok)
    bad = raw.filter(~ok)
    return good, bad


def start_ingest(good: DataFrame, *, out_path: str, checkpoint: str,
                 fmt: str = "parquet", trigger_seconds: int | None = 10,
                 available_now: bool = False) -> StreamingQuery:
    """Append sink with the reference's 10 s cadence (St1) by default;
    available_now drains everything once (used by tests and backfills)."""
    writer = (good.writeStream.format(fmt)
              .outputMode("append")
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start(out_path)


def ingest_kafka_shaped(frame: DataFrame, schema: T.StructType
                        ) -> tuple[DataFrame, DataFrame]:
    """Decode a (key binary, value binary) Kafka-shaped frame (batch or
    streaming) into typed rows + dead letters — the exact broker-side
    transform of the reference, as one reusable step."""
    from ..sources.kafka import decode_json_values

    return split_malformed(decode_json_values(frame, schema))
