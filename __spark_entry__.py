"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every registered operator from
redpanda_iceberg_duckdb_spark.registry for the driver's DuckDB-oracle
correctness gate (see SURVEY.md section 2 for the inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redpanda_iceberg_duckdb_spark.registry import all_queries  # noqa: E402
from redpanda_iceberg_duckdb_spark.session import configure_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference Q1 per-group analytics) on sf0.001."""
    configure_session(spark)
    q = all_queries()["q1_trade_analytics"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():
        def wrapped(spark: SparkSession, sf_dir: str, _q=q) -> DataFrame:
            configure_session(spark)
            return _q.fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
