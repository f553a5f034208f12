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
# so ordering is a verification-coverage decision. Since round 8 this list
# is MECHANICALLY DERIVED, not hand-curated: verification_manifest.json
# fingerprints every query (defining-module source + one level of intra-
# package imports + oracle SQL — see verification.py), and the contract
# test (tests/test_driver_contract.py) FAILS unless every query whose
# fingerprint mismatches the manifest sits in this window or the pending
# queue. Regenerate entries with `python tools/regen_manifest.py r{N}`;
# promote window evidence to green evidence at the start of the next round
# with `--promote`.
_VERIFY_FIRST = [
    # HEAD: round-15 new queries (the window head is reserved for new +
    # fingerprint-changed queries first; oldest-evidence rotation takes
    # the leftover slots).
    "dedup_stream_tws_replay",
    "pipe_syntax_orders", "collation_lcase_groups",
    "session_window_builtin",
    "welch_ttest_value", "granger_lag1_hourly", "pacf_durbin_levinson",
    "hodges_lehmann_quantity_shift",
    "katz_centrality_4hop", "linear_cka_dim_halves",
    "sinkhorn_plan_labels", "krippendorff_alpha_labels",
    "periodogram_hourly_power",
    "speculative_acceptance_rate", "beam_search_paths",
    "unigram_viterbi_segmentation",
    "stratified_att_purchase", "shortest_path_dag_sigma",
    "fellegi_sunter_weights",
    "wilson_ci_weekend_share", "eb_shrunken_user_rates",
    # Evidence-freshness rotation (r14 verdict item 1): the final 11
    # r01-evidence queries — green rows here leave ZERO queries with
    # pre-r05 evidence.
    "quality_score", "retention_cohorts", "setop_engaged_users",
    "small_quantity_parts", "source_lang_profile", "text_stats",
    "tfidf_top_terms", "token_count_regex", "unpivot_lineitem_measures",
    "window_rank_functions", "zscore_outliers",
    # Spare slots: oldest remaining evidence (r05), alphabetical.
    "ann_ivf_multiprobe", "approx_aggregates", "cosine_topk_bruteforce",
    "customers_without_orders", "events_hourly_incremental",
    "full_outer_daily_activity", "morton_zorder_stats",
    "nation_order_rollup", "order_priority_semijoin",
    "q3_verification_agg", "q4_reaggregation", "q5_topk",
    "q6_summary_union", "range_join_error_proximity",
    "sequence_packing_bins", "stratified_sample_by_source",
    "top_customers_by_spend", "tpch_q10_returned_items",
    # (remaining r05 entries — tpch_q13_order_distribution,
    # tpch_q14_promo_revenue, tpch_q15_top_supplier,
    # tpch_q18_large_orders,
    # tpch_q19_disjunctive_predicate, tpch_q1_pricing_summary,
    # tpch_q3_shipping_priority, tpch_q5_local_supplier_volume,
    # tpch_q6_forecast_revenue, tpch_q7_nation_volume,
    # window_distribution_functions, window_running_total,
    # window_topk_per_user — rotate next round; the round-15 operator
    # additions took their slots.)
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green (with a matching
# manifest fingerprint) or explicitly queued here — nothing can be silently
# unverified.
_PENDING_NEXT_WINDOW: list[str] = []


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
            # Per-query cache clear: queries that persist intermediates
            # (LSH signatures, KMV sketches) are bounded within their own
            # execution instead of leaking storage memory across the
            # driver's sequential 150-query correctness run.
            spark.catalog.clearCache()
            return _q.fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in _ordered_queries().items()
            if q.oracle is not None}
