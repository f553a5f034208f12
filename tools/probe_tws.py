"""r16 probe: decompose dedup_stream_tws_replay's per-micro-batch fixed
cost (verdict item 4 — the costliest registered query, 15.8 s in the
driver's r15 run). Prints the StreamingQueryProgress duration breakdown
per batch plus wall timings of the chunk-file build and the replay.

Usage: python tools/probe_tws.py [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
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
    args = ap.parse_args()

    import shutil
    import tempfile

    from redpanda_iceberg_duckdb_spark.operators import tws15
    from redpanda_iceberg_duckdb_spark.streaming.dedup_tws import (
        run_chunked_tws_replay)

    spark = get_spark("probe_tws")
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    for r in range(args.runs):
        tmp = tempfile.mkdtemp(prefix="tws_probe_")
        try:
            t0 = time.perf_counter()
            tws15._write_chunked_events(spark, args.sf_dir, tmp)
            t_write = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows, progress = run_chunked_tws_replay(
                spark, tmp, key="user_id",
                schema=("event_id long, user_id long, ts timestamp, "
                        "chunk int"),
                watermark="1 hour", delay_ms=tws15._D_MS,
                collect_progress=True)
            t_replay = time.perf_counter() - t0
            print(f"# run {r}: chunk-write {t_write:.3f}s "
                  f"replay {t_replay:.3f}s rows {len(rows)}",
                  file=sys.stderr)
            for p in progress:
                d = p.get("durationMs", {})
                so = p.get("stateOperators", [{}])
                so0 = so[0] if so else {}
                print(json.dumps({
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": d,
                    "state": {k: so0.get(k) for k in (
                        "numRowsTotal", "numRowsUpdated", "numRowsRemoved",
                        "commitTimeMs", "timerProcessingTimeMs",
                        "allUpdatesTimeMs", "allRemovalsTimeMs")},
                }), file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
