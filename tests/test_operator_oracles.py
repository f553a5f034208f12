"""Driver-style oracle parity for every registered query that has an oracle,
at smoke scale (sf0.001) for all and correctness scale (sf0.01) for the
non-reference extended operators (reference ones are covered in
test_reference_queries.py)."""

from __future__ import annotations

import pytest

from redpanda_iceberg_duckdb_spark.registry import all_queries

from .oracle_harness import run_compare

EXTENDED = [n for n, q in all_queries().items()
            if q.oracle is not None and "reference" not in q.tags]


@pytest.mark.parametrize("name", EXTENDED)
def test_extended_oracle_smoke(spark, sf_smoke, name):
    run_compare(spark, all_queries()[name], sf_smoke)


@pytest.mark.parametrize("name", EXTENDED)
def test_extended_oracle_sf001(spark, sf_correct, name):
    run_compare(spark, all_queries()[name], sf_correct)
