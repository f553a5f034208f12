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
    # The round-6 late registrations: each passed the local oracle replica
    # (sf0.001 + sf0.01) in r6 but has never had a driver CORRECTNESS row.
    # Green rows here complete cumulative driver coverage of all registered
    # queries (everything else was green in some r01-r06 window).
    "minhash_lsh_pairs_dfcap", "curation_end_to_end", "skew_hot_key_join",
    "kmv_set_overlap", "containment_closure", "mixture_resample",
    "chunk_documents_udtf",
    # New in round 7 (registered early enough to ride this window).
    "streaming_validate_replay", "sentence_chunks_udtf",
    "snapshot_retention_audit",
    "late_data_drop_replay", "stream_dedup_replay", "semdedup_survivors",
    "shared_ngram_span_pairs", "l_diversity_audit",
    "merge_upsert_replay", "scd2_history_replay", "stream_outer_join_replay",
    "bpe_pair_frequencies", "ann_ivf_recall_at_k", "lsh_recall_vs_exact",
    "utf8_byte_audit", "uuid_from_int_audit",
    # Second round-7 batch (this session), never driver-checked.
    "bm25_topk_docs", "inverted_index_postings", "pagerank_trade_graph",
    "triangle_count_neardup", "bloom_ngram_decontamination",
    "unigram_logprob_quality", "cdc_chunk_stats", "ppjoin_exact_pairs",
    "kmeans_lloyd_step", "jl_projection_distortion", "kafka_wire_replay",
    "zipf_fit_by_source", "graph_degree_stats",
    # Implementation changed in r7 after their last green row (spread +
    # outer-explode plan fixes) — re-verify even though r01-r06 rows exist.
    "winnow_fingerprints", "simhash_signatures", "simhash_near_dup_pairs",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "dedup_clusters",
    "cluster_best_survivors", "decontamination_overlap", "containment_pairs",
    "doc_repetition_score", "bigram_frequencies", "leakage_safe_splits",
]

# Queries registered this round AFTER the 50-slot window filled; each passes
# the local oracle replica and is queued to head _VERIFY_FIRST next round.
# The window-contract test (tests/test_driver_contract.py) enforces that
# every tail query is either previously driver-green or explicitly queued
# here — nothing can be silently unverified.
_PENDING_NEXT_WINDOW: list[str] = [
    # Registered late in round 7 after the 50-slot window filled (48 pinned
    # + 2 tail greens); each passes the local oracle replica at
    # sf0.001+sf0.01 and heads _VERIFY_FIRST next round.
    "rrf_fusion_topk", "multimodal_frame_dedup", "join_cardinality_audit",
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
