"""r16 probe: decompose ivm_stream_refresh_replay (verdict item 6).
Times each batch's apply_delta plan construction, the checkpoint
materialization, and the final stacked collect, plus Spark job counts
per phase (statusTracker job ids).

Usage: python tools/probe_ivm.py [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_iceberg_duckdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--eager", action="store_true",
                    help="eager checkpoints per batch (phase timing)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from redpanda_iceberg_duckdb_spark.operators.ivm_stream import (
        _REV, _batch_bounds)
    from redpanda_iceberg_duckdb_spark.streaming.ivm_sink import (
        IvmState, apply_delta, empty_state)
    from redpanda_iceberg_duckdb_spark.tables import load_table

    spark = get_spark("probe_ivm")
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    tracker = spark.sparkContext.statusTracker

    def jobs() -> int:
        try:
            ids = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
            return len(ids)
        except Exception:
            return -1

    for r in range(args.runs):
        orders = load_table(spark, args.sf_dir, "orders")
        line = load_table(spark, args.sf_dir, "lineitem")
        state = empty_state(spark)
        t_all = time.perf_counter()
        for i, (lo, hi) in enumerate(_batch_bounds(), 1):
            def rng(col, lo=lo, hi=hi):
                cond = F.lit(True)
                if lo:
                    cond = cond & (col >= F.lit(lo).cast("timestamp"))
                if hi:
                    cond = cond & (col < F.lit(hi).cast("timestamp"))
                return cond
            d_o = (orders.filter(rng(F.col("o_orderdate")))
                   .select("o_orderkey", "o_custkey"))
            d_l = (line.filter(rng(F.col("l_shipdate")))
                   .select("l_orderkey", F.expr(_REV).alias("rev")))
            t0 = time.perf_counter()
            nxt = apply_delta(state, d_o, d_l)
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            eager = bool(args.eager)
            state = IvmState(nxt.view.localCheckpoint(eager=eager),
                             nxt.orders.localCheckpoint(eager=eager),
                             nxt.lines.localCheckpoint(eager=eager))
            t_cp = time.perf_counter() - t0
            print(f"# run{r} batch{i}: plan {t_plan:.3f}s cp {t_cp:.3f}s",
                  file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        n = state.view.count()
        print(f"# run{r}: final count {time.perf_counter()-t0:.3f}s "
              f"({n} rows) total {time.perf_counter()-t_all:.3f}s",
              file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
