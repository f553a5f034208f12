"""PySpark-native analytics engine with the query/data-processing surface of
meticulo3366/redpanda-iceberg-duckdb (see SURVEY.md), re-expressed Spark-first.

Layout:
  session.py    - SparkSession factory (AQE, UTC, tuned shuffle partitions)
  tables.py     - fixture-table loaders (parquet -> temp views)
  registry.py   - query registry powering __spark_entry__ and bench.py
  operators/    - all query operators (reference parity + extended library)
  sources/      - Kafka / Iceberg / JSON connector wiring (gated: no broker in CI)
  streaming/    - Structured Streaming ingest + windowed aggregation jobs
  functions/    - reusable column expression helpers (decimal-exact aggs, cosine)
  generator.py  - deterministic trade-data generator (reference producer parity)
"""

__version__ = "0.1.0"
