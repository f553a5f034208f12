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
    # HEAD: the round-12 pending queue — the only registered queries with
    # zero driver evidence (round-12 verdict item 1). Green rows here make
    # every query in the engine's history driver-verified.
    "rich_club_coefficient", "circular_hour_stats", "hill_tail_index",
    "yule_k_lexical_diversity", "funnel_stream_replay",
    "markov_entropy_rate", "permutation_entropy_hourly",
    # Round-12 verdict item 2: stream_state_bound_replay split into an
    # oracled expected-state query (state_metrics.py derives held/evicted
    # per batch from event timestamps; DuckDB recomputes the same bounds)
    # + the engine-metric equality kept in test_stateful_streaming.py.
    "stream_state_expected",
    # Verdict item 3 fallout: pq_train.py Lloyd block-chaining changes the
    # module fingerprint, so both trained-PQ queries re-verify.
    "pq_trained_distortion", "ivf_pq_trained_recall",
    # quantizer_train.py fingerprints mutual_nn_retrained via its import.
    "mutual_nn_retrained",
    # Verdict item 5: logistic regression to convergence (glm12.py).
    "logistic_irls_converged", "logistic_first_newton_step",
    # Verdict item 6: funnel-sink state accounting (oracled per item 2's
    # pattern) + fingerprint fallout on the existing funnel replay row.
    "funnel_state_expected",
    # Verdict item 7: substring-dedup shingle keys hashed (xxhash64 both
    # engines) — module fingerprint changes, all three rows re-verify.
    "exact_substring_spans", "exact_substring_cutlist",
    "cross_source_span_leakage",
    # ADVICE fallout: graph12.py / infotheory12.py unpersist fixes change
    # those modules' fingerprints (markov/permutation entropy are already
    # at the head as pending-queue entries).
    "clustering_coefficient_parts",
    # Round-13 new queries, appended as registered (window has room):
    "kneser_ney_perplexity_by_source", "mahalanobis_outliers_topk",
    "holt_linear_hourly", "edge_triangle_support", "ivm_state_expected",
    # ivm_stream.py fingerprint fallout (state-expected addition):
    "ivm_stream_refresh_replay", "ivm_retraction_replay",
    "sprt_state_expected", "sprt_stream_decision_replay",
    "wasserstein_value_by_type_pair", "circular_emd_hours",
    "multimodal_wav_stats", "cox_ph_converged",
    "brier_decomposition_hourly", "shared_prefix_boilerplate",
    "sparse_cosine_topk_pairs", "span_position_profile",
    "qte_value_weekday_weekend", "dedup_savings_by_source",
    # Spare window slots: re-verify the queries whose green evidence is
    # OLDEST (r01) — fresh driver rows on decade-old evidence instead of
    # letting registry order pick the filler.
    "ann_ivf_topk", "asof_join_pandas", "asof_join_window",
    "cdc_latest_state", "conversion_funnel", "cube_type_dow",
    "customers_above_avg_balance", "deterministic_sample_stats",
    "doc_fingerprint", "doc_length_histogram", "embedding_near_dup_pairs",
    "events_hourly", "heavy_hitters_users",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green (with a matching
# manifest fingerprint) or explicitly queued here — nothing can be silently
# unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # Registered after the 50-slot window filled; local-replica green at
    # sf0.001 + sf0.01, queued for the round-14 driver window.
    "content_novelty_curve", "logrank_signup_conversion",
    "cramer_von_mises_value", "boosted_stumps_two_rounds",
    "dtw_hour_profiles", "seasonality_strength_hourly",
    "token_burstiness_topk", "negative_binomial_fit_by_type",
    "weighted_jaccard_sources", "runs_test_hourly",
    "hapax_share_by_source",
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
