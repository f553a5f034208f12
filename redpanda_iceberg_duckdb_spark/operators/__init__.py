"""Operator library. Importing this package registers every query in
redpanda_iceberg_duckdb_spark.registry.QUERIES."""

from . import trade_queries  # noqa: F401
