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
    # HEAD: the round-13 pending queue — the only registered queries with
    # zero driver evidence (round-13 verdict item 1). Green rows here make
    # every query in the engine's history driver-verified. Per verdict
    # item 5, the window head is reserved for (new + fingerprint-changed)
    # queries FIRST; oldest-evidence rotation only takes the leftover
    # slots at round seal.
    "content_novelty_curve", "logrank_signup_conversion",
    "cramer_von_mises_value", "boosted_stumps_two_rounds",
    "dtw_hour_profiles", "seasonality_strength_hourly",
    "token_burstiness_topk", "negative_binomial_fit_by_type",
    "weighted_jaccard_sources", "runs_test_hourly",
    "hapax_share_by_source",
    # Round-14 fingerprint fallout — advice fixes (cox13 half-away-from-
    # zero snaps; pq_train raw-count gate + frame reuse; logrank imports
    # cox13 and is already at the head):
    "cox_ph_converged", "pq_trained_distortion", "ivf_pq_trained_recall",
    # Verdict item 2: the shared co-purchase edge cache changes graph12 +
    # graph13 fingerprints.
    "clustering_coefficient_parts", "edge_triangle_support",
    # Round-14 new queries:
    "wav_ingest_dead_letter_replay",
    # Full plan-doctor sweep fallout: UDTFs switched to Arrow-batched
    # eval (useArrow=True) — udtf_ops fingerprint changes.
    "chunk_documents_udtf", "sentence_chunks_udtf",
    # Embedding-engineering batch (embed14.py):
    "matryoshka_recall_curve", "mmd_linear_label_pairs", "cluster_medoids",
    # Monitoring-statistics batch (stats14.py):
    "ljung_box_hourly", "page_hinkley_hourly", "friedman_test_type_day",
    "anderson_darling_value",
    # Dependence + transform-selection batch (stats14b.py):
    "kendall_tau_b_hourly", "boxcox_loglik_grid",
    # Robust location + third modality (robust14.py, multimodal14.py):
    "huber_location_converged", "multimodal_frame_sample",
    # Dedup-eval overlap metric (rouge14.py):
    "rouge2_candidate_pairs",
    # Full-distribution embedding drift (ot14.py):
    "sliced_wasserstein_labels",
    # Generation-diversity audit (diversity14.py):
    "self_bleu2_by_source",
    # Seasonal forecasting state (timeseries14.py):
    "holt_winters_seasonal_hourly",
    # Spark 4 VARIANT surface (variant14.py):
    "variant_props_extract",
    # Luhn mod-10 PII validator (luhn14.py):
    "luhn_checksum_audit",
    # Double-sweep BFS diameter bound (graph14.py):
    "double_sweep_diameter",
    # connected_components driver fast path (clusters.py) fingerprint
    # fallout:
    "dedup_clusters", "cluster_best_survivors", "leakage_safe_splits",
    "er_fuzzy_clusters",
    # Spare window slots (new + changed all seated above, per r13 verdict
    # item 5): re-verify the 17 queries whose green evidence is OLDEST —
    # all still r01 after the r13 rotation covered the first 13; the
    # remaining eleven r01 queries (quality_score, retention_cohorts,
    # setop_engaged_users, small_quantity_parts, source_lang_profile,
    # text_stats, tfidf_top_terms, token_count_regex,
    # unpivot_lineitem_measures, window_rank_functions, zscore_outliers)
    # rotate in round 15.
    "interval_join_purchase_signup", "json_props_stats", "label_centroids",
    "lang_id_heuristic", "orders_by_month", "parts_like_filter",
    "percentiles_by_type", "pii_redaction_audit",
    "pivot_user_bucket_by_type",
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
