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
    # Round-8 late registrations — never driver-checked, head the window
    # (round-8 verdict item 3): green rows here complete cumulative driver
    # coverage of all 201 pre-round-9 queries.
    "stable_row_ids_two_phase", "range_frame_moving_revenue",
    "equi_depth_deciles", "bpe_train_merges", "incremental_dedup_new_batch",
    "bpe_encode_stats", "bootstrap_ci_by_type", "minhash_estimator_error",
    # Fingerprint changed this round, derived by verification.must_verify:
    # graphrank + quantizer_train lazy-localCheckpoint recovery of the r8
    # pagerank regression (+ train-assignment memoization), and the
    # data-driven frontier prune rewrite (round-8 verdict items 1-2).
    "pagerank_trade_graph", "pagerank_converged", "triangle_count_neardup",
    "graph_degree_stats", "kmeans_train_converged", "ann_recall_retrained",
    "pareto_frontier_parts",
    # New round-9 registrations + replay.py/bpe_train.py edit fallout:
    # St6 keyed-produce ordering, F9 seeded-generator parity vs committed
    # snapshot, skyline composed over a join, BPE at (unique text, count)
    # granularity (round-8 verdict items 5-7).
    "kafka_keyed_order_replay", "seeded_trades_parity",
    "supplier_frontier_over_join", "bpe_train_merges_wordcount",
    "kafka_wire_replay", "streaming_validate_replay",
    # Pipeline audits composing the engine's own dedup/quantizer machinery.
    "split_leakage_audit", "embedding_dim_stats",
    # Training-order + retrieval additions.
    "epoch_shuffle_ranks", "ann_mrr_at_10", "mmr_diverse_topk",
    # Data-layout payoff, measured as a query.
    "file_skipping_audit",
    # Mergeable sketch state: sliding-window HLL via register-wise max.
    "hll_sliding_window_distinct",
    # Weighted sampling without replacement (integer-power ES keys).
    "weighted_sample_no_replacement",
    # Submodular greedy max-coverage selection (unrolled oracle).
    "greedy_coverage_selection",
    # Contrastive-training data prep: hardest cross-label negatives.
    "hard_negative_mining",
    # Distributed prefix-sum: concat-then-chunk token block assignment.
    "token_block_assignment",
    # M4 pixel-bucket downsampling (VLDB 2014): one struct-min/max agg.
    "m4_downsample_events",
    # CUPED variance-reduced A/B readout (WSDM 2013): sufficient stats.
    "cuped_adjusted_metrics",
    # Join-delta IVM (SIGMOD 1986): state + two broadcast delta joins,
    # bit-exact vs direct recompute via the decimal-sum discipline.
    "ivm_join_delta_revenue", "ivm_delta_term_counts",
    # Gramian sufficient-stats PCA: one Arrow pass -> d^2 aggregate ->
    # dimension-bounded driver power iteration (oracle re-runs the same
    # iteration as a recursive CTE).
    "embedding_pca_power",
    # One-scan leave-one-source-out ablation; precedence-pair mining;
    # Theil-Sen robust trend (deterministic lower-median pair).
    "loo_source_ablation", "event_precedence_support",
    "theilsen_hourly_trend",
    # CUSUM via the prefix-min window identity (no recursion/UDF);
    # quantile normalization onto pooled order statistics (two-phase
    # global rank, exact integer position mapping).
    "cusum_changepoint_hourly", "quantile_normalize_by_type",
    # Out-of-fold smoothed target encoding: one (key, fold) aggregate,
    # double marginalization, leakage-free by construction.
    "target_encoding_oof",
    # Exact Mann-Whitney AUC: rank-sum identity over two-phase ranks.
    "auc_mann_whitney",
    # Kaplan-Meier product-limit conversion curve with right censoring.
    "kaplan_meier_conversion",
    # MASE seasonal-naive forecast backtest (exact integer error sums).
    "mase_seasonal_naive",
    # IPS/SNIPS counterfactual policy value; one-pass Deequ-style checks.
    "offpolicy_ips_snips", "data_quality_checks",
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
