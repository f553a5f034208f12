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


# The driver's correctness gate checks the FIRST 50 queries in dict order,
# so ordering is a verification-coverage decision: names listed here are the
# ones that most need a driver-green row THIS round — queries whose
# implementation changed since their last green row, plus queries that have
# never had one. Unchanged queries with a green CORRECTNESS_r{N} row rotate
# to the tail (their old green row remains the evidence). Keep this list
# under ~50 and re-derive it each round.
_VERIFY_FIRST = [
    # Broken by the r04 testdata regen (timestamp[us] no-tz -> TIMESTAMP_NTZ
    # broke unix_micros); fixed in session.py/tables.py this round — need a
    # fresh green row.
    "window_event_gaps", "sessionization",
    # The r02 late-registration queue: every name below passes the local
    # oracle replica (tests/test_operator_oracles.py at sf0.001 + sf0.01) but
    # has never had a driver CORRECTNESS row. Rotating all 48 in (2 + 48 = 50)
    # gives every registered query a cumulative driver-green row.
    "tpch_q9_product_profit", "tpch_q12_priority_shipping",
    "lateral_topk_orders",
    "vocab_growth_by_bucket", "token_novelty_ratio",
    "token_entropy_by_source", "mode_token_per_source",
    "profile_orders", "weighted_median_by_type",
    "mixture_allocation", "quality_filter_funnel", "token_budget_topp",
    "hash_sample_per_source", "curation_pipeline_stats",
    "gap_fill_hourly", "hourly_moving_stats",
    "event_path_trigrams", "event_type_transitions",
    "cluster_quality_silhouette",
    "mad_outliers_by_type", "chi2_priority_seasonality",
    "corr_value_props_by_type", "ols_hourly_trend",
    "user_concentration_by_type", "range_filter_semijoin",
    "ntile_value_quartiles", "benford_price_digits",
    "cluster_best_survivors",
    "session_stats", "value_distribution_drift", "ewma_hourly_counts",
    "source_vocab_overlap", "table_checksums", "rollup_chain_monthly",
    "embedding_quantization_audit", "sliding_distinct_users_24h",
    "chunk_documents_sliding", "chunk_dedup_groups",
    "referential_integrity_audit", "keyset_pagination_orders",
    "k_anonymity_audit", "leakage_safe_splits",
    "winsorized_stats_by_type", "token_cooccurrence_lift",
    "ordered_funnel_users", "rfm_segments",
    "tpch_q4_order_priority", "tpch_q17_small_quantity_revenue",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green or explicitly queued
# here — nothing can be silently unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # registered in round 6 after the 50-slot window filled with the r02
    # backlog; each passes the local oracle replica at sf0.001 + sf0.01
    "minhash_lsh_pairs_dfcap", "curation_end_to_end", "skew_hot_key_join",
    "kmv_set_overlap", "containment_closure", "mixture_resample",
    "chunk_documents_udtf",
]


def _ordered_queries():
    qs = all_queries()
    ordered = [n for n in _VERIFY_FIRST if n in qs]
    ordered += [n for n in qs if n not in set(_VERIFY_FIRST)]
    return {n: qs[n] for n in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in _ordered_queries().items():
        def wrapped(spark: SparkSession, sf_dir: str, _q=q) -> DataFrame:
            configure_session(spark)
            return _q.fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in _ordered_queries().items()
            if q.oracle is not None}
