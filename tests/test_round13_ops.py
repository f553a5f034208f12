"""Round-13 operator gates: plan-shape assertions (the positive claims the
generic plan-doctor sweep doesn't make) plus semantic invariants the
DuckDB oracles can't see (identities, bounds, decoder behavior)."""

from __future__ import annotations

import re

import pytest

from redpanda_iceberg_duckdb_spark import plans
from redpanda_iceberg_duckdb_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_mahalanobis_plan_is_broadcast_topk(spark):
    """Moments broadcast onto the scan, top-k as TakeOrderedAndProject,
    no window, no shuffled cartesian."""
    df = all_queries()["mahalanobis_outliers_topk"].fn(spark, SF)
    p = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_wasserstein_window_is_pair_partitioned(spark):
    """The cumulative-CDF window must be partitioned by the type pair —
    partition columns print first in windowspecdefinition without a sort
    direction."""
    df = all_queries()["wasserstein_value_by_type_pair"].fn(spark, SF)
    p = plans.physical_plan(df)
    assert re.search(r"windowspecdefinition\(ta#\d+, tb#\d+,", p), p[:1500]
    assert "CartesianProduct" not in p
    rows = df.collect()
    assert rows and all(r["w1_dollars"] >= 0 for r in rows)


def test_sparse_cosine_plan_and_bounds(spark):
    df = all_queries()["sparse_cosine_topk_pairs"].fn(spark, SF)
    p = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    rows = df.collect()
    assert rows
    assert all(-1e-9 <= r["cosine"] <= 1 + 1e-9 for r in rows)
    assert all(r["d1"] < r["d2"] for r in rows)


def test_kneser_ney_no_window_and_prob_mass(spark):
    df = all_queries()["kneser_ney_perplexity_by_source"].fn(spark, SF)
    assert "Window" not in plans.physical_plan(df)
    rows = df.collect()
    # perplexity = exp(cross-entropy) up to the micro-nat snap
    import math
    for r in rows:
        assert abs(r["perplexity"]
                   - math.exp(r["cross_entropy_nats"])) < 1e-2
        assert r["cross_entropy_nats"] > 0


def test_holt_no_window_and_rmse_nonneg(spark):
    df = all_queries()["holt_linear_hourly"].fn(spark, SF)
    assert "Window" not in plans.physical_plan(df)
    r = df.collect()[0]
    assert r["n_hours"] > 0 and r["rmse"] >= 0


def test_wav_stats_runs_in_arrow_batch_path(spark):
    df = all_queries()["multimodal_wav_stats"].fn(spark, SF)
    assert "MapInPandas" in plans.physical_plan(df)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_samples"] == 64 and r["duration_us"] == 8000
        assert 0 <= r["peak_abs"] <= 32768
        assert 0 <= r["zero_crossings"] <= 63


def test_wav_decoder_rejects_and_walks_chunks():
    """decode_wav must reject non-RIFF payloads and skip unknown chunks
    (the fixture plants a LIST chunk before fmt/data)."""
    from redpanda_iceberg_duckdb_spark.operators.multimodal13 import (
        decode_wav, wav_fixture)

    rate, n, data = decode_wav(wav_fixture(b"hello world" * 20))
    assert (rate, n) == (8000, 64)
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x10\x00\x00\x00WAVE")  # no fmt/data chunks


def test_brier_murphy_identity_within_snap(spark):
    """brier = reliability - resolution + uncertainty holds up to the
    micro snapping of the per-bin probabilities."""
    r = all_queries()["brier_decomposition_hourly"].fn(spark, SF).collect()[0]
    ident = r["reliability"] - r["resolution"] + r["uncertainty"]
    assert abs(r["brier"] - ident) < 1e-3, r.asDict()


def test_circular_emd_bounds(spark):
    r = all_queries()["circular_emd_hours"].fn(spark, SF).collect()[0]
    assert 0 <= r["emd_hours"] <= 12  # max mean transport on a 24-cycle
    assert r["n_weekday"] > 0 and r["n_weekend"] > 0


def test_cox_converges_fast_and_is_consistent(spark):
    import math
    r = all_queries()["cox_ph_converged"].fn(spark, SF).collect()[0]
    assert r["n_iters"] <= 10
    assert abs(r["hazard_ratio"]
               - round(math.exp(r["beta_micro"] / 1e6), 6)) < 1e-9


def test_edge_support_consistent_with_clustering(spark):
    """sum(support * n_edges) counts each triangle 3 times — must equal
    3 * n_triangles from clustering_coefficient_parts on the same graph."""
    sup = all_queries()["edge_triangle_support"].fn(spark, SF).collect()
    cc = all_queries()["clustering_coefficient_parts"].fn(spark, SF)\
        .collect()[0]
    mass = sum(r["support"] * r["n_edges"] for r in sup)
    assert mass == 3 * cc["n_triangles"]
    assert sum(r["n_edges"] for r in sup) == cc["n_edges"]


def test_boilerplate_counts_nontrivial(spark):
    """The operator must actually fire on the corpus (r12 lesson: a
    0-row result that matches the oracle is verification theater)."""
    rows = all_queries()["shared_prefix_boilerplate"].fn(spark, SF).collect()
    assert rows and sum(r["n_boilerplate_docs"] for r in rows) >= 2


def test_dtw_matches_reference_dp(spark):
    """The min-plus enter-column row update must equal the textbook
    3-move DTW DP, verified against an independent Python implementation
    on the same per-mille profiles."""
    from pyspark.sql import functions as F

    from redpanda_iceberg_duckdb_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    rows = (ev.select(F.hour("ts").cast("long").alias("h"),
                      (F.expr("extract(DAYOFWEEK_ISO FROM ts)") <= 5)
                      .cast("int").alias("wd"))
            .groupBy("h").agg(F.sum("wd").alias("c1"),
                              F.sum(1 - F.col("wd")).alias("c2"))
            .collect())
    byh = {r["h"]: (r["c1"], r["c2"]) for r in rows}
    c1 = [byh.get(h, (0, 0))[0] for h in range(24)]
    c2 = [byh.get(h, (0, 0))[1] for h in range(24)]
    n1, n2 = sum(c1), sum(c2)
    pa = [(2000 * c + n1) // (2 * n1) for c in c1]
    pb = [(2000 * c + n2) // (2 * n2) for c in c2]
    dp = [[0] * 24 for _ in range(24)]
    for i in range(24):
        for j in range(24):
            c = abs(pa[i] - pb[j])
            if i == 0 and j == 0:
                dp[i][j] = c
            elif i == 0:
                dp[i][j] = c + dp[0][j - 1]
            elif j == 0:
                dp[i][j] = c + dp[i - 1][0]
            else:
                dp[i][j] = c + min(dp[i - 1][j], dp[i - 1][j - 1],
                                   dp[i][j - 1])
    got = all_queries()["dtw_hour_profiles"].fn(spark, SF).collect()[0]
    assert got["dtw_cost_permille"] == dp[23][23]
    assert (got["n_weekday"], got["n_weekend"]) == (n1, n2)
