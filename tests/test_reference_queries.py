"""Driver-style oracle parity for the six reference queries (SURVEY.md 2.11)."""

from __future__ import annotations

import pytest

from redpanda_iceberg_duckdb_spark.registry import all_queries

from .oracle_harness import run_compare

REF = [n for n, q in all_queries().items() if "reference" in q.tags]


@pytest.mark.parametrize("name", REF)
def test_reference_query_oracle_smoke(spark, sf_smoke, name):
    run_compare(spark, all_queries()[name], sf_smoke)


@pytest.mark.parametrize("name", REF)
def test_reference_query_oracle_sf001(spark, sf_correct, name):
    run_compare(spark, all_queries()[name], sf_correct)
