"""Scale-technique verification: salted joins produce identical results to
plain joins; bucketed tables co-locate joins without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark import plans
from redpanda_iceberg_duckdb_spark.functions.skew import salted_join
from redpanda_iceberg_duckdb_spark.tables import load_tables


def test_salted_join_equals_plain(spark, sf_smoke):
    t = load_tables(spark, sf_smoke, "orders", "customer")
    big = t["orders"].withColumnRenamed("o_custkey", "c_custkey")
    small = t["customer"].select("c_custkey", "c_mktsegment")

    plain = (big.join(small, "c_custkey")
             .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")))
    salted = (salted_join(big, small, "c_custkey", salts=8)
              .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, plain.collect())) == \
           sorted(map(tuple, salted.collect()))


def test_bucketed_join_avoids_shuffle(spark, sf_smoke, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the join
    key needs no Exchange on either side — the 100 TB answer for repeated
    fact-fact joins."""
    # warehouse.dir is static; tables land in ./spark-warehouse (gitignored)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t = load_tables(spark, sf_smoke, "orders", "lineitem")
        (t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("orders_b"))
        (t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
         .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("lineitem_b"))

        joined = (spark.table("orders_b").join(spark.table("lineitem_b"),
                                               "o_orderkey")
                  .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")))
        plan = plans.physical_plan(joined)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in join_section
        # ground truth: same result as the plain (shuffling) join
        plain = (t["orders"].join(
            t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey")
            .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
               sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_zorder_write_clusters_both_dimensions(spark, sf_smoke, tmp_path):
    """zorder_write must produce files whose min/max ranges are tight on
    BOTH interleaved dimensions (that's what makes parquet min/max stats
    prune scans filtered on either column). A plain write gives every file
    ~the full range; z-ordered files must average well under half of it."""
    import glob

    from redpanda_iceberg_duckdb_spark.operators.sampling_packing import (
        zorder_write)
    from redpanda_iceberg_duckdb_spark.tables import load_table

    e = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", F.floor(F.col("value") / 2).alias("vbucket"))
    out = str(tmp_path / "zorder")
    zorder_write(e, out, "user_id", "vbucket", files=16)

    glo = e.agg(F.max("user_id") - F.min("user_id"),
                F.max("vbucket") - F.min("vbucket")).collect()[0]
    u_span, v_span = float(glo[0]), float(glo[1])

    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 8
    u_widths, v_widths = [], []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.max("user_id") - F.min("user_id"),
            F.max("vbucket") - F.min("vbucket")).collect()[0]
        u_widths.append(float(r[0])); v_widths.append(float(r[1]))
    # average per-file span must shrink on BOTH dims simultaneously
    assert sum(u_widths) / len(u_widths) <= 0.55 * u_span, (u_widths, u_span)
    assert sum(v_widths) / len(v_widths) <= 0.55 * v_span, (v_widths, v_span)
