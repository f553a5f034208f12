"""Same-box A/B probe for the triangle/clustering bench family (round-13
verdict item 2). Times clustering_coefficient_parts (x1, twice),
edge_triangle_support, mutual_nn_pairs x1/x2, and the ppjoin canary in ONE
fresh session at sf0.1, printing a JSON line. Run it once per code variant
(r12 graph12.py vs r13 vs the round-14 cached version) on a quiet box.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from redpanda_iceberg_duckdb_spark.registry import all_queries  # noqa: E402
from redpanda_iceberg_duckdb_spark.session import configure_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def timed(out, name, fn):
    t0 = time.perf_counter()
    fn()
    out[name] = round(time.perf_counter() - t0, 3)
    print(f"# {name} {out[name]}s", file=sys.stderr)


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)
    qs = all_queries()
    out: dict[str, float] = {}

    cc = qs["clustering_coefficient_parts"]
    cc.fn(spark, SF).count()                       # warm-up (bench protocol)
    spark.catalog.clearCache()
    timed(out, "triangles_x1", lambda: cc.fn(spark, SF).count())
    spark.catalog.clearCache()
    timed(out, "triangles_x1_again", lambda: cc.fn(spark, SF).count())
    spark.catalog.clearCache()
    timed(out, "edge_triangle_support",
          lambda: qs["edge_triangle_support"].fn(spark, SF).count())
    spark.catalog.clearCache()

    mnn = qs["mutual_nn_pairs"]
    mnn.fn(spark, SF).count()
    spark.catalog.clearCache()
    timed(out, "mutual_nn_x1", lambda: mnn.fn(spark, SF).count())
    spark.catalog.clearCache()
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    mx = e.agg(F.max("vec_id"), F.max("label")).collect()[0]
    sv, sl = (mx[0] or 0) + 1, (mx[1] or 0) + 1
    copy = e.select((F.col("vec_id") + sv).alias("vec_id"), "embedding",
                    (F.col("label") + sl).cast("int").alias("label"))
    tmp = tempfile.mkdtemp(prefix="mnn_ab_")
    try:
        (e.unionByName(copy.select(*e.columns))
         .write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet"))
        timed(out, "mutual_nn_x2", lambda: mnn.fn(spark, tmp).count())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.clearCache()

    timed(out, "canary_ppjoin",
          lambda: qs["ppjoin_exact_pairs"].fn(spark, SF).count())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
