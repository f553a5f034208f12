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
    # HEAD: the round-10 closing-batch queue — the only 17 registered
    # queries with zero driver evidence across ten rounds (round-10
    # verdict item 1). Each already passes the local oracle replica
    # (tests/test_round10c/d_ops planted checks); this window produces
    # their first driver CORRECTNESS rows.
    "basket_frequent_pairs", "max_concurrent_open_lines",
    "naive_bayes_lang_confusion", "bigram_surprisal_bands",
    "heaps_law_fit", "conformal_interval_coverage",
    "kcenter_farthest_points", "ams_f2_sketch",
    "kcore_degree_histogram", "label_propagation_sizes",
    "bh_fdr_discoveries", "sssp_cheapest_paths",
    "t_closeness_audit", "temperature_mixture_allocation",
    "sprt_sequential_decision", "rendezvous_shard_audit",
    "binary_segmentation_splits",
    # Round-11 fingerprint fallout (re-verify after source change):
    # resampling-tier 99x/64x md5-constant cut (one digest per cell,
    # bit b = replicate b's side), ANOVA exact-integer between_raw
    # (round-10 ADVICE #4), Theil-Sen oracle-side thinning parity
    # (ADVICE #1), k-means farthest-point seeding (verdict item 4),
    # dataset_cache content-robust fingerprints (ADVICE #2).
    "hash_permutation_test", "kruskal_wallis_value", "anova_f_oneway",
    "ks_two_sample_value",
    "theilsen_hourly_trend", "kmeans_train_converged",
    "pagerank_trade_graph", "pagerank_converged", "triangle_count_neardup",
    "graph_degree_stats", "ann_recall_retrained",
    # Round-11 new queries (registered below the 50-slot window tail, so
    # they must be named here to enter the window):
    "sprt_stream_decision_replay",
    "mann_kendall_trend", "spearman_value_hour",
    "brown_forsythe_variance", "mcnemar_purchase_halves",
    "hyperplane_lsh_near_dups", "pq_code_distortion",
    "personalized_pagerank_seeds", "link_prediction_jaccard",
    "rocchio_feedback_topk", "tokenizer_fertility_by_lang",
    "decision_stump_hour_split", "pinball_loss_eval",
    "fano_factor_burstiness", "davies_bouldin_clusters",
    "token_kl_by_source_pair", "cochran_armitage_trend",
    # Round-11 perf fallout (re-verify after the O(len^2) split fix +
    # merge-table memoization in bpe_train.py):
    "bpe_train_merges", "bpe_train_merges_wordcount", "bpe_encode_stats",
    "pq_adc_recall_at_5", "ivf_pq_recall_at_5",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green (with a matching
# manifest fingerprint) or explicitly queued here — nothing can be silently
# unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # Registered after the round-11 window filled (50 named slots); each
    # passes the local oracle replica (tests/test_round11_ops.py planted
    # checks) and heads round 12's window.
    "rolling_origin_cv_folds", "woe_iv_hour_bins",
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
