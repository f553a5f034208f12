"""Full driver simulation: every registered query vs its DuckDB oracle at
sf0.01 (or argv[1]) through the exact-compare harness. Prints one line per
query and a final tally — the local replica of the round harness's
correctness gate, run before sealing a round.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from redpanda_iceberg_duckdb_spark.registry import all_queries  # noqa: E402
from redpanda_iceberg_duckdb_spark.session import configure_session  # noqa: E402
from tests.oracle_harness import run_compare  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    configure_session(spark)
    print("entry rows:", entry_mod.entry(spark).count(), flush=True)
    qs = all_queries()
    names = list(entry_mod.queries())            # driver order
    fails = []
    for i, n in enumerate(names):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            run_compare(spark, qs[n], sf)
            print(f"[{i+1}/{len(names)}] OK {n} "
                  f"{time.perf_counter()-t0:.2f}s", flush=True)
        except Exception as ex:                  # noqa: BLE001
            fails.append(n)
            print(f"[{i+1}/{len(names)}] FAIL {n}: {ex}", flush=True)
            traceback.print_exc()
    print(f"TALLY {len(names)-len(fails)}/{len(names)} green; "
          f"fails: {fails}", flush=True)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
