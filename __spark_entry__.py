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
    # Round-7 late registrations — never driver-checked, head the window
    # (round-7 verdict item 1): green rows here complete cumulative driver
    # coverage of every registered query.
    "rrf_fusion_topk", "multimodal_frame_dedup", "join_cardinality_audit",
    # Fingerprint changed this round (persist->localCheckpoint leak fixes in
    # dedup/graphrank/setsim/contamination/sketches/tpch_shapes + their
    # importers; PPJoin broadcast-hint removal). Derived by the manifest —
    # every name below failed the sha match against its last-green source.
    "ppjoin_exact_pairs", "pagerank_trade_graph", "triangle_count_neardup",
    "graph_degree_stats", "minhash_lsh_pairs", "minhash_lsh_pairs_dfcap",
    "simhash_signatures", "simhash_near_dup_pairs", "ngram_jaccard_pairs",
    "lsh_recall_vs_exact", "containment_pairs", "containment_closure",
    "decontamination_overlap", "bloom_ngram_decontamination",
    "doc_repetition_score", "dedup_exact_groups", "dedup_exact_survivors",
    "kmv_set_overlap", "fm_distinct_sketch", "hll_lite_distinct",
    "count_min_heavy_hitters", "histogram_quantiles",
    "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q11_important_value", "tpch_q12_priority_shipping",
    "tpch_q16_supplier_part_counts", "tpch_q17_small_quantity_revenue",
    "tpch_q20_part_share_suppliers", "tpch_q21_sole_late_supplier",
    "tpch_q22_idle_rich_customers", "fuzzy_part_names",
    "grouping_sets_orders", "lateral_topk_orders",
    # New in round 8 (exactly fills the 50-slot window).
    "pagerank_converged", "kmeans_train_converged", "ann_recall_retrained",
    "pareto_frontier_parts", "percentile_disc_exact", "entropy_by_source",
    "ordered_string_agg_parts", "pivot_event_counts",
    "session_window_replay", "interval_islands_shipping",
    "asof_forward_tolerance",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green (with a matching
# manifest fingerprint) or explicitly queued here — nothing can be silently
# unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # Registered after round 8's 50-slot window filled; each passes the
    # local oracle replica at sf0.001+sf0.01 and heads _VERIFY_FIRST next
    # round.
    "stable_row_ids_two_phase", "range_frame_moving_revenue",
    "equi_depth_deciles", "bpe_train_merges", "incremental_dedup_new_batch",
    "bpe_encode_stats", "bootstrap_ci_by_type", "minhash_estimator_error",
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
