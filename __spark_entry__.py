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
    # HEAD: the round-11 pending queue — the only two registered queries
    # with zero driver evidence (round-11 verdict item 1). Green rows here
    # make every query in the engine's history driver-verified.
    "rolling_origin_cv_folds", "woe_iv_hour_bins",
    # Round-12 perf fallout: pagerank_converged driver-sync cut (verdict
    # item 2) changes graphrank.py, so every query fingerprinting through
    # it re-verifies.
    "pagerank_converged", "pagerank_trade_graph",
    "personalized_pagerank_seeds", "graph_degree_stats",
    "link_prediction_jaccard", "triangle_count_neardup",
    # Round-12 new queries (verdict items 3-5), appended as registered:
    "exact_substring_spans", "exact_substring_cutlist",
    "pq_trained_distortion", "ivf_pq_trained_recall",
    "multimodal_pixel_stats",
    # multimodal.py fingerprint fallout (PPM decoder added to the module):
    "multimodal_meta", "multimodal_byte_features", "multimodal_frame_dedup",
    # Streaming state-store accounting (rows-only: engine metrics have
    # nothing for a SQL oracle to recompute; pytest holds the closed-form
    # assertions — see operators/state_metrics.py).
    "stream_state_bound_replay",
    "gopher_repetition_signals", "intra_doc_repeated_spans",
    "cross_source_span_leakage", "degree_assortativity",
    "ols_price_on_quantity",
    "funnel_view_click_purchase", "time_decayed_engagement",
    "part_name_fuzzy_blocks",
    # Round-12 third..seventh batches, registered AFTER the 25 slots above
    # were pinned: the window still has room (44 named <= 50), so they get
    # driver evidence THIS round instead of waiting in the pending queue.
    "clustering_coefficient_parts", "er_fuzzy_clusters",
    "average_precision_purchases", "feature_hashing_collisions",
    "dp_noisy_counts", "mutual_nn_pairs",
    "bigram_perplexity_quality", "chao1_vocab_richness",
    "good_turing_counts", "nelson_aalen_hazard", "sax_hourly_motifs",
    "correlation_matrix_lineitem", "skipgram_negative_sampling_table",
    "greedy_coverage_selection", "kcenter_farthest_points",
    "haar_energy_by_level", "ridge_price_model", "mutual_nn_retrained",
    "logistic_first_newton_step",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green (with a matching
# manifest fingerprint) or explicitly queued here — nothing can be silently
# unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # Round-12 eighth batch — window already at 50; local-replica green at
    # sf0.001 + sf0.01, queued for the round-13 driver window.
    "rich_club_coefficient", "circular_hour_stats", "hill_tail_index",
    "yule_k_lexical_diversity", "funnel_stream_replay",
    "markov_entropy_rate", "permutation_entropy_hourly",
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
