"""Round-10 targeted tests: dataset-fingerprint cache keys (a parquet
rewrite inside one application must be a cache MISS — round-9 advice),
and the data-quality referential check's duplicate-key robustness."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.registry import all_queries


def test_edge_cache_misses_on_data_rewrite(spark, tmp_path):
    """Rewriting the parquet under an sf_dir within one Spark application
    (the bench tmp-dir pattern) must invalidate graphrank's checkpointed
    edge cache: the second run must see the NEW data, not stale blocks."""
    d = str(tmp_path / "ds")
    os.makedirs(d)
    for t in ("orders", "lineitem"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    f"{d}/{t}.parquet")
    q = all_queries()["graph_degree_stats"]
    rows_small = [tuple(r) for r in q.fn(spark, d).collect()]

    # Rewrite IN PLACE with a structurally different graph (sf0.01).
    for t in ("orders", "lineitem"):
        shutil.copy(f"/root/testdata/sf0.01/{t}.parquet",
                    f"{d}/{t}.parquet")
    rows_big = [tuple(r) for r in q.fn(spark, d).collect()]
    assert rows_big != rows_small, \
        "edge cache served stale data after an in-place parquet rewrite"

    # And it matches a fresh read of the same dataset from its home dir.
    rows_ref = [tuple(r) for r in
                q.fn(spark, "/root/testdata/sf0.01").collect()]
    assert rows_big == rows_ref


def test_train_cache_misses_on_data_rewrite(spark, tmp_path):
    """Same hazard for quantizer_train._TRAIN_CACHE: in-place rewrite of
    embeddings.parquet must re-train, not serve stale assignments."""
    from redpanda_iceberg_duckdb_spark.operators.quantizer_train import (
        train_assignments)

    d = str(tmp_path / "ds")
    os.makedirs(d)
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet",
                f"{d}/embeddings.parquet")
    fin1, _ = train_assignments(spark, d)
    a1 = sorted(map(tuple, fin1.collect()))
    shutil.copy("/root/testdata/sf0.01/embeddings.parquet",
                f"{d}/embeddings.parquet")
    fin2, _ = train_assignments(spark, d)
    a2 = sorted(map(tuple, fin2.collect()))
    assert a2 != a1, \
        "train cache served stale assignments after a parquet rewrite"
    ref = sorted(map(tuple, train_assignments(
        spark, "/root/testdata/sf0.01")[0].collect()))
    assert a2 == ref


def test_dq_referential_check_survives_duplicate_dim_keys(spark, tmp_path):
    """The ref_exists check joins orders against customer keys; a duplicated
    c_custkey must NOT fan out orders rows (which would inflate every
    counter in the shared one-pass aggregate). Plant a customer table where
    every key appears twice and assert all counters equal the clean run's."""
    from redpanda_iceberg_duckdb_spark.operators.data_quality import (
        data_quality_checks)

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "ds")
    os.makedirs(d)
    shutil.copy(f"{src}/orders.parquet", f"{d}/orders.parquet")
    cust = spark.read.parquet(f"{src}/customer.parquet")
    cust.unionAll(cust).write.mode("overwrite").parquet(
        f"{d}/customer.parquet")

    clean = {(r["check_name"], r["col"]): (r["violations"],
                                           r["pass_fraction"])
             for r in data_quality_checks(spark, src).collect()}
    dup = {(r["check_name"], r["col"]): (r["violations"], r["pass_fraction"])
           for r in data_quality_checks(spark, d).collect()}
    assert dup == clean
