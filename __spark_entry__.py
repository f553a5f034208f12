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
    # reference-parity contract + TPC-H + windows: first driver check r02
    "q1_trade_analytics", "q2_cardinality", "q3_verification_agg",
    "q4_reaggregation", "q5_topk", "q6_summary_union",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "order_priority_semijoin", "customers_without_orders",
    "top_customers_by_spend", "nation_order_rollup",
    "tpch_q10_returned_items", "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue", "tpch_q18_large_orders",
    "full_outer_daily_activity", "tpch_q7_nation_volume",
    "tpch_q15_top_supplier", "tpch_q19_disjunctive_predicate",
    "window_running_total", "window_topk_per_user", "window_event_gaps",
    "sessionization", "window_distribution_functions",
    # new in r02
    "tpch_q2_min_cost_supplier", "tpch_q8_market_share",
    "tpch_q11_important_value", "tpch_q16_supplier_part_counts",
    "tpch_q20_part_share_suppliers", "tpch_q21_sole_late_supplier",
    "tpch_q22_idle_rich_customers",
    # implementation changed in r02
    "multimodal_byte_features", "approx_aggregates",
    "cosine_topk_bruteforce", "dedup_clusters",
    # new pipeline operators in r02
    "stratified_sample_by_source", "sequence_packing_bins",
    "morton_zorder_stats", "decontamination_overlap",
    "doc_repetition_score", "containment_pairs", "ann_ivf_multiprobe",
    "events_hourly_incremental", "histogram_quantiles",
    "count_min_heavy_hitters", "range_join_error_proximity",
    # LSH candidate path refactored in r02 (lsh_candidates extraction)
    "minhash_lsh_pairs",
]

# Queries registered late in r02, AFTER the 50-slot window above was already
# full of higher-stakes entries (the r01-untested reference-parity/TPC-H/
# window set and the r02-changed implementations). They pass the full local
# oracle replica (tests/test_operator_oracles.py at sf0.001 + sf0.01) and are
# queued to head _VERIFY_FIRST in the NEXT round, displacing entries that
# will by then hold a driver-green CORRECTNESS_r02 row. The window-contract
# test (tests/test_driver_contract.py) enforces that every tail query is
# either previously driver-green or explicitly queued here — nothing can be
# silently unverified.
_PENDING_NEXT_WINDOW = [
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
