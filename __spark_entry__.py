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
    # Round-10 fingerprint fallout, derived by verification.must_verify:
    # the dataset-fingerprint cache keys (round-9 advice — graphrank
    # _EDGE_CACHE + quantizer_train._TRAIN_CACHE now miss when parquet is
    # rewritten in-application) and the data_quality referential check's
    # distinct-key broadcast (structural EXISTS parity).
    "pagerank_trade_graph", "pagerank_converged", "triangle_count_neardup",
    "graph_degree_stats", "kmeans_train_converged", "ann_recall_retrained",
    "data_quality_checks",
    # Recurring IVM refresh: k=4 delta batches through the streaming
    # sink's own apply_delta, view state carried forward, oracle = direct
    # recompute after EVERY batch (round-9 verdict item 2).
    "ivm_stream_refresh_replay",
    # Frontier constant cut (round-9 verdict item 3): data-scaled bucket
    # count (~sqrt(N)/4) + accuracy-1000 sketch; survivor gate unchanged.
    "pareto_frontier_parts", "supplier_frontier_over_join",
    # Theil-Sen quadratic guard: per-series point cap with deterministic
    # rank-equi-spaced thinning (no-op on fixture lengths).
    "theilsen_hourly_trend",
    # DQ tier 2: cross-batch profile drift with tolerance bands (the
    # Deequ anomaly-detection half of validate-before-publish).
    "dq_cross_batch_drift",
    # PCA tier 2: top-4 basis via Hotelling deflation (one Gramian pass,
    # m driver-side iterations; chained recursive-CTE oracle).
    "embedding_pca_top4", "embedding_pca_power",
    # IVF quality/cost dial graded as data: recall@10 + MRR@10 at
    # nprobe 1/2/4 from one shared candidate scan.
    "ann_recall_mrr_by_nprobe",
    # New round-10 operators (eval + curation + text + graph tiers):
    # Bradley-Terry preference strengths (MM on the m x m wins matrix),
    # DSIR hashed-ngram importance selection, ECE reliability bins,
    # Cohen's kappa, adjacent-token PMI collocations, hub-capped
    # bipartite supplier projection.
    "bradley_terry_strengths", "dsir_importance_topk",
    "ece_calibration_bins", "cohens_kappa_labelers",
    "pmi_collocations_topk", "bipartite_supplier_projection",
    # Concentration audits + the isotonic calibration map (PAV via the
    # closed-form minimax identity — no iteration).
    "gini_customer_spend", "herfindahl_by_nation",
    "isotonic_calibration_bins",
    # Mixture construction: exact-balance stratified K-fold and
    # token-budget-bounded per-source selection (hash-ordered).
    "stratified_kfold_assignment", "token_budget_mixture",
    # Z-set retractions through the unchanged IVM transform: deletion =
    # insertion of negative multiplicity; exact-zero netting proven.
    "ivm_retraction_replay",
    # Markov stationary distribution (general row-stochastic chain, the
    # data-estimated sibling of PageRank) + bucket-jackknife ratio SE.
    "markov_stationary_events", "jackknife_ratio_se",
    # Monitoring + robust + CDC tier: PSI batch drift, categorical MI,
    # snapshot-diff changelog derivation, trimmed/winsorized means.
    "psi_price_drift", "mutual_information_type_hour",
    "snapshot_diff_changelog", "trimmed_winsorized_means",
    # Causal/valuation tier: DiD, Qini uplift deciles (two-phase-ranked
    # tiles), exact 3-group Shapley attribution.
    "difference_in_differences", "qini_uplift_deciles",
    "shapley_source_value",
    # Late-batch distribution/lag diagnostics: exact two-sample KS on
    # the cross-multiplied integer lattice, one-way ANOVA from bigint
    # sufficient stats, dense-spine hourly ACF, view->purchase CCF.
    "ks_two_sample_value", "anova_f_oneway",
    "acf_hourly_lags", "crosscorr_lead_lag",
    # NDCG@10 (graded-relevance IVF eval, integer log discounts) and
    # Neyman-optimal stratified allocation (exact largest remainder).
    "ndcg_at_10", "neyman_allocation",
    # U-shaped multi-touch attribution (integer nano-credits) and
    # sorted-neighborhood dedup blocking (two-phase ranks, banded join).
    "multitouch_attribution", "sorted_neighborhood_pairs",
    # Spatial-grid DBSCAN labeling (3x3 cell equi-join, brute-force
    # oracle) and item-item CF cosine neighbors (capped baskets).
    "dbscan_grid_labels", "item_item_cosine_recs",
    # Landmark BFS over the rare-part co-purchase graph (frontier joins,
    # recursive-CTE oracle) and exact-integer HITS hubs/authorities.
    "bfs_hop_distance", "hits_hubs_authorities",
    # Kruskal-Wallis (doubled midranks, two-phase cumulation) and the
    # md5-seeded 64-permutation mean-difference test (decimal128 exact).
    "kruskal_wallis_value", "hash_permutation_test",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green (with a matching
# manifest fingerprint) or explicitly queued here — nothing can be silently
# unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # Registered after round 10's 50-slot window filled; each passes the
    # local oracle replica at sf0.001 + sf0.01 (tests/test_operator_oracles
    # + tests/test_round10c_ops planted checks) and heads _VERIFY_FIRST
    # next round. Apriori brand pairs, interval sweep-line concurrency,
    # integer-lattice Naive Bayes confusion, bigram surprisal bands,
    # Heaps'-law fit, split-conformal coverage, k-center coreset seeds,
    # AMS tug-of-war F2 sketch.
    "basket_frequent_pairs", "max_concurrent_open_lines",
    "naive_bayes_lang_confusion", "bigram_surprisal_bands",
    "heaps_law_fit", "conformal_interval_coverage",
    "kcenter_farthest_points", "ams_f2_sketch",
    # second closing batch: 3-core peel histogram, label-propagation
    # community sizes, BH-FDR over the 10 pairwise block-randomization
    # tests (tests/test_round10d_ops planted checks).
    "kcore_degree_histogram", "label_propagation_sizes",
    "bh_fdr_discoveries", "sssp_cheapest_paths",
    "t_closeness_audit", "temperature_mixture_allocation",
    "sprt_sequential_decision", "rendezvous_shard_audit",
    "binary_segmentation_splits",
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
