"""Operator library. Importing this package registers every query in
redpanda_iceberg_duckdb_spark.registry.QUERIES."""

from . import analytics, arrays, asof, cdc, clusters, corpus, dedup, sketches, grouping, multimodal, scalar, similarity, text, tpch, tpch_extra, trade_queries, windows  # noqa: F401
