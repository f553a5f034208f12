"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query
wall-clock seconds. Timing includes plan + execution + result fetch
(count of the final DataFrame), excluding JVM startup.

Methodology: each query runs twice and reports the faster run —
steady-state throughput (first execution pays one-time whole-stage-codegen
compilation of that query's generated code, which on a real cluster is
amortized across repeated/parameterized runs). Cold times are printed to
stderr alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redpanda_iceberg_duckdb_spark.registry import all_queries
from redpanda_iceberg_duckdb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    names = [n for n, q in all_queries().items() if q.bench]
    # Warm the JVM + file listing once with the cheapest action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        q = all_queries()[name]
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = q.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        print(f"# {name}: warm {min(runs):.3f}s cold {max(runs):.3f}s "
              f"({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
