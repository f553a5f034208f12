"""Plan and semantics tests for the scale-pattern operators (oracle parity
itself is covered by the auto-parametrized test_operator_oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark import plans
from redpanda_iceberg_duckdb_spark.registry import all_queries


def _q(spark, sf, name):
    return all_queries()[name].fn(spark, sf)


def test_two_phase_distinct_has_no_expand(spark, sf_smoke):
    """The two-phase shape must NOT plan an Expand (countDistinct's rewrite);
    both phases are plain partial-aggregated HashAggregates."""
    plan = plans.physical_plan(_q(spark, sf_smoke, "user_concentration_by_type"))
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 2


def test_range_filter_semijoin_filters_before_join(spark, sf_smoke):
    """The probe side is range-filtered before the semi join: the plan holds
    the 1-row bounds broadcast (nested-loop), a between filter on o_custkey,
    and then the LeftSemi."""
    plan = plans.physical_plan(_q(spark, sf_smoke, "range_filter_semijoin"))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "o_custkey" in plan


def test_ntile_single_window_shuffle(spark, sf_smoke):
    plan = plans.physical_plan(_q(spark, sf_smoke, "ntile_value_quartiles"))
    assert "ntile(4)" in plan
    assert "Window" in plan


def test_benford_prunes_to_one_column(spark, sf_smoke):
    schema = plans.scan_read_schema(
        _q(spark, sf_smoke, "benford_price_digits"), "lineitem")
    assert "l_extendedprice" in schema
    assert "l_orderkey" not in schema and "l_shipdate" not in schema


def test_ntile_buckets_balanced(spark, sf_smoke):
    """NTILE(4) bucket sizes per group differ by at most 1 (the definition),
    and every group has exactly 4 buckets."""
    rows = _q(spark, sf_smoke, "ntile_value_quartiles").collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.n)
    for etype, sizes in by_type.items():
        assert len(sizes) == 4, etype
        assert max(sizes) - min(sizes) <= 1, etype


def test_best_survivor_quality_dominates_cluster(spark, sf_smoke):
    """The chosen survivor's quality is the max quality within its cluster
    (cross-checked against dedup_clusters membership + quality_score)."""
    from redpanda_iceberg_duckdb_spark.operators.clusters import (
        connected_components,
    )
    from redpanda_iceberg_duckdb_spark.operators.dedup import minhash_lsh_pairs
    from redpanda_iceberg_duckdb_spark.operators.text import quality_score

    comps = connected_components(
        minhash_lsh_pairs(spark, sf_smoke).select("d1", "d2"))
    q = quality_score(spark, sf_smoke)
    max_q = {r.comp: r.mq for r in
             comps.join(q, comps.node == q.doc_id)
             .groupBy("comp").agg(F.max("quality").alias("mq")).collect()}
    for r in _q(spark, sf_smoke, "cluster_best_survivors").collect():
        assert r.best_quality == max_q[r.cluster_id], r


def test_session_stats_consistent_with_sessionization(spark, sf_smoke):
    """n_sessions and total events must agree with the per-session table
    that `sessionization` itself produces."""
    sessions = _q(spark, sf_smoke, "sessionization").collect()
    stats = _q(spark, sf_smoke, "session_stats").collect()[0]
    assert stats.n_sessions == len(sessions)
    assert stats.n_bounces == sum(1 for s in sessions if s.n_events == 1)
    assert stats.max_events == max(s.n_events for s in sessions)


def test_drift_shares_sum_to_zero(spark, sf_smoke):
    """Each half's bucket shares sum to 1, so signed drift sums to ~0 and
    every event is assigned to exactly one (bucket, half)."""
    rows = _q(spark, sf_smoke, "value_distribution_drift").collect()
    total = sum(r.n_early + r.n_late for r in rows)
    from redpanda_iceberg_duckdb_spark.tables import load_table
    assert total == load_table(spark, sf_smoke, "events").count()
    assert abs(sum(r.share_drift for r in rows)) < 1e-5


def test_checksum_detects_any_row_difference(spark, sf_smoke, sf_correct):
    """Checksums are order-independent but content-sensitive: the same
    table at two scale factors (superset rows) must differ, and each
    table's n_rows must equal its actual count."""
    from redpanda_iceberg_duckdb_spark.tables import load_table

    small = {r.table_name: r for r in
             _q(spark, sf_smoke, "table_checksums").collect()}
    big = {r.table_name: r for r in
           _q(spark, sf_correct, "table_checksums").collect()}
    for t in ["customer", "orders", "lineitem"]:
        assert small[t].n_rows == load_table(spark, sf_smoke, t).count()
        assert small[t].checksum != big[t].checksum, t
        assert small[t].checksum != 0, t


def test_quantization_audit_no_explode_and_bounded_error(spark, sf_smoke):
    """The per-vector work stays in higher-order functions (no Generate in
    the plan) and int8 reconstruction error is bounded by scale/2 =
    (max-min)/510 — the quantizer's contract."""
    from pyspark.sql import functions as F2
    from redpanda_iceberg_duckdb_spark import plans
    from redpanda_iceberg_duckdb_spark.tables import load_table

    df = _q(spark, sf_smoke, "embedding_quantization_audit")
    assert "Generate" not in plans.physical_plan(df)
    emb = load_table(spark, sf_smoke, "embeddings")
    worst_scale = emb.select(
        ((F2.array_max("embedding").cast("double")
          - F2.array_min("embedding").cast("double")) / 255.0).alias("s")
    ).agg(F2.max("s")).collect()[0][0]
    for r in df.collect():
        assert r.worst_err_ns / 1e9 <= worst_scale / 2 + 1e-9, r


def test_keyset_pagination_uses_take_ordered(spark, sf_smoke):
    """Both page fetches plan as TakeOrderedAndProject — no global sort,
    no offset scan."""
    from redpanda_iceberg_duckdb_spark import plans
    df = _q(spark, sf_smoke, "keyset_pagination_orders")
    assert plans.has_take_ordered(df)


def test_leakage_safe_split_never_straddles_pairs(spark, sf_smoke):
    """The leakage invariant itself: every verified near-dup pair lands in
    the SAME split (both docs share a cluster, clusters are atomic)."""
    from pyspark.sql import functions as F2
    from redpanda_iceberg_duckdb_spark.functions.hashing import md5_mod_spark
    from redpanda_iceberg_duckdb_spark.operators.clusters import (
        connected_components,
    )
    from redpanda_iceberg_duckdb_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, sf_smoke).select("d1", "d2")
    comps = connected_components(pairs)
    bucket = F2.expr(md5_mod_spark("cast(comp as string)", 10))
    doc_split = comps.select(F2.col("node").alias("doc"),
                             bucket.alias("b")).collect()
    split_of = {r.doc: r.b for r in doc_split}
    for p in pairs.collect():
        assert split_of[p.d1] == split_of[p.d2], p


def test_kmv_sketch_is_mergeable(spark, sf_smoke):
    """The property that makes KMV a SKETCH: the k smallest hashes of a
    union equal the k smallest of the union of per-partition k-smallest
    sets. Split events in two halves, sketch each, merge by min-k, compare
    to the sketch of the whole — bit-identical."""
    from pyspark.sql import Window as W, functions as F

    from redpanda_iceberg_duckdb_spark.functions.hashing import md5_mod_spark
    from redpanda_iceberg_duckdb_spark.operators.sketches import _KMV_K, _M
    from redpanda_iceberg_duckdb_spark.tables import load_table

    e = load_table(spark, sf_smoke, "events")
    elem = ("concat(cast(user_id AS string), ':', "
            "cast(cast(ts AS date) AS string))")
    uh = e.select("event_type",
                  F.expr(md5_mod_spark(elem, _M)).alias("h"),
                  (F.col("event_id") % 2).alias("half"))
    wt = W.partitionBy("event_type").orderBy("h")

    def topk(df):
        return (df.select("event_type", "h").distinct()
                .withColumn("rn", F.row_number().over(wt))
                .filter(F.col("rn") <= _KMV_K).drop("rn"))

    whole = topk(uh)
    merged = topk(topk(uh.filter("half = 0"))
                  .unionAll(topk(uh.filter("half = 1"))))
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_containment_closure_multi_hop(spark):
    """The fixture corpora yield only 1-hop closures, so prove the recursion
    tail on planted edges: a 3-link chain plus a disjoint edge must produce
    2-hop and 3-hop transitive pairs with correct min_hops."""
    from redpanda_iceberg_duckdb_spark.operators.contamination import (
        _CLOSURE_SQL)

    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "d1 long, d2 long"
    ).createOrReplaceTempView("_containment_edges")
    got = {(r.d_src, r.d_dst): r.min_hops
           for r in spark.sql(_CLOSURE_SQL).collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (3, 4): 1, (10, 11): 1,
                   (1, 3): 2, (2, 4): 2, (1, 4): 3}
