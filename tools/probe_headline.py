"""Optimization probe: time headline (+ selected heavy extras) queries
with bench.py's exact methodology (2 runs, warm min, count() action) and
capture .explain('formatted') plans to plans/<round>/.

Usage:
    python tools/probe_headline.py [--plans-suffix before|after] \
        [--only q1,q2,...] [--extras] [--sf-dir DIR] [--plans-round r16]

Runs on an otherwise-idle box (verify skill: never time against a
concurrent Spark session). Writes per-query seconds to stdout and the
plan files to plans/<round>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_iceberg_duckdb_spark.registry import all_queries  # noqa: E402
from redpanda_iceberg_duckdb_spark.session import get_spark  # noqa: E402

HEAVY_EXTRAS = [
    "minhash_lsh_pairs", "ppjoin_exact_pairs", "dedup_clusters",
    "edge_triangle_support", "double_sweep_diameter",
    "shortest_path_dag_sigma", "unigram_viterbi_segmentation",
    "dedup_stream_tws_replay", "cosine_topk_bruteforce",
    "semdedup_survivors", "simhash_near_dup_pairs",
    "ann_ivf_recall_at_k", "sparse_cosine_topk_pairs",
    "matryoshka_recall_curve", "rouge2_candidate_pairs",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-suffix", default=None,
                    help="write plans/r15/<q>_<suffix>.txt when set")
    ap.add_argument("--only", default=None)
    ap.add_argument("--extras", action="store_true",
                    help="also run the HEAVY_EXTRAS list")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-round", default="r16",
                    help="plans/<round>/ subdir for --plans-suffix files")
    args = ap.parse_args()

    spark = get_spark("probe_headline")
    sf_dir = args.sf_dir
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qs = all_queries()
    names = [n for n, q in qs.items() if q.bench]
    if args.extras:
        names += [n for n in HEAVY_EXTRAS if n not in names]
    if args.only:
        names = [n.strip() for n in args.only.split(",")]

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.plans_round)
    if args.plans_suffix:
        os.makedirs(plans_dir, exist_ok=True)

    # Driver-loop queries execute eagerly inside fn(); "capturing the plan"
    # would run the whole loop once more for a final-frame plan that says
    # nothing about the loop structure. Skip those.
    eager_loop = {"dedup_stream_tws_replay", "unigram_viterbi_segmentation",
                  "pagerank_converged", "kmeans_train_converged",
                  "cox_ph_converged"}

    timings = {}
    for name in names:
        q = qs[name]
        if args.plans_suffix and name not in eager_loop:
            try:
                df = q.fn(spark, sf_dir)
                mode = (spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted"))
                plan = df._jdf.queryExecution().explainString(mode)
                with open(os.path.join(
                        plans_dir,
                        f"{name}_{args.plans_suffix}.txt"), "w") as f:
                    f.write(plan)
            except Exception as exc:  # driver-loop queries execute eagerly
                print(f"# plan capture failed for {name}: {exc}",
                      file=sys.stderr)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"probe:{name}")
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_rows = q.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        print(f"# {name}: warm {min(runs):.3f}s cold {max(runs):.3f}s "
              f"({n_rows} rows)", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "timings": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
