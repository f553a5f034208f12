"""Registry-wide physical-plan scan-multiplicity audit (r15 batch 8
methodology, re-run as r16 verdict item 7): for every registered query,
build the DataFrame and count parquet-scan node headers per table in the
formatted plan; list queries scanning any table >= the threshold.

Eager driver-loop queries (plan says nothing about the loop) are skipped,
same set as tools/probe_headline.py.

Usage: python tools/scan_audit.py [--sf-dir DIR] [--min 3] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_iceberg_duckdb_spark.registry import all_queries  # noqa: E402
from redpanda_iceberg_duckdb_spark.session import get_spark  # noqa: E402

EAGER_LOOP = {"dedup_stream_tws_replay", "unigram_viterbi_segmentation",
              "pagerank_converged", "kmeans_train_converged",
              "cox_ph_converged"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--min", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("scan_audit")
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    qs = all_queries()
    flagged = {}
    errors = {}
    for name, q in qs.items():
        if name in EAGER_LOOP:
            continue
        try:
            df = q.fn(spark, args.sf_dir)
            mode = (spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            errors[name] = str(exc)[:160]
            continue
        finally:
            spark.catalog.clearCache()
        # one header line per scan node: "(N) Scan parquet" — count per
        # table via the Location detail that follows each header
        tables: dict[str, int] = {}
        for m in re.finditer(r"Location: InMemoryFileIndex[^\n]*?"
                             r"([a-z_0-9]+)\.parquet", plan):
            t = m.group(1)
            tables[t] = tables.get(t, 0) + 1
        worst = max(tables.values(), default=0)
        if worst >= args.min:
            flagged[name] = tables
            print(f"# {name}: {tables}", file=sys.stderr, flush=True)
    out = {"sf_dir": args.sf_dir, "min": args.min,
           "flagged": flagged, "errors": errors,
           "n_queries": len(qs)}
    text = json.dumps(out, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
