"""Round-8 targeted tests: storage-leak regression for the
persist->localCheckpoint conversions, the Pareto prune-exactness property,
the session_window boundary rule our oracle encodes, and a planted
forward-asof fixture exercising tolerance and tie semantics."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.registry import all_queries


def test_no_cache_manager_leak_after_checkpointed_queries(spark, sf_smoke):
    """Round-7 verdict item: queries that materialize shared intermediates
    must not leave session-lifetime CacheManager entries behind (the old
    persist() pattern leaked one cached table per invocation). Run the
    previously-leaking queries twice each and assert the cache is empty."""
    spark.catalog.clearCache()
    qs = all_queries()
    for name in ("pagerank_trade_graph", "triangle_count_neardup",
                 "minhash_lsh_pairs_dfcap", "ppjoin_exact_pairs"):
        for _ in range(2):
            qs[name].fn(spark, sf_smoke).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pareto_frontier_matches_bruteforce(spark):
    """Prune exactness: the bucket-prune-verify skyline equals the O(N²)
    dominance definition on adversarial synthetics — duplicates (ties in
    both dims stay), collinear staircases, and one bucket-boundary-heavy
    grid (prices at exact multiples of the bucket width)."""
    from redpanda_iceberg_duckdb_spark.operators.frontier import (
        pareto_frontier)

    rng = random.Random(8)
    cases = [
        [(rng.uniform(0, 1000), rng.randint(1, 50)) for _ in range(300)],
        # exact duplicates + staircase
        [(100.0, 10), (100.0, 10), (200.0, 20), (300.0, 30), (250.0, 25)],
        # bucket-boundary grid: prices on exact multiples of 100
        [(float(100 * i), s) for i in range(10) for s in (5, 10, 15)],
    ]
    for pts in cases:
        rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
        df = spark.createDataFrame(rows, "id long, price double, size int")
        got = sorted(r["id"] for r in
                     pareto_frontier(df, "price", "size").collect())
        want = sorted(
            i for i, (p, s) in enumerate(pts)
            if not any((q <= p and t >= s and (q < p or t > s))
                       for q, t in pts))
        assert got == want


def test_session_window_merge_boundary(spark):
    """Pin the merge rule session_window_replay's oracle encodes: a gap of
    EXACTLY the 30-min duration still MERGES (Spark merges events landing
    on the previous window's end); one microsecond over splits."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=30)),          # exact gap
        (2, t0), (2, t0 + dt.timedelta(minutes=30,
                                       microseconds=1)),      # just over
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
           .count().groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_sessions"))
           .collect())
    got = {r["user_id"]: r["n_sessions"] for r in out}
    assert got == {1: 1, 2: 2}


def test_asof_forward_tolerance_planted(spark, tmp_path):
    """Planted fixture: next-purchase matching honors direction (never
    matches an earlier purchase), equal-ts inclusion, smaller-id tie-break,
    and the 7-day tolerance null-out."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        # user 1: signup then purchase 1h later -> match 101
        (1, 1, t0, "signup"), (101, 1, t0 + dt.timedelta(hours=1), "purchase"),
        # user 2: purchase BEFORE signup only -> no match
        (102, 2, t0 - dt.timedelta(hours=1), "purchase"), (2, 2, t0, "signup"),
        # user 3: purchase beyond 7 days -> nulled by tolerance
        (3, 3, t0, "signup"), (103, 3, t0 + dt.timedelta(days=8), "purchase"),
        # user 4: two purchases at the SAME ts as the signup -> smaller id
        (4, 4, t0, "signup"), (105, 4, t0, "purchase"), (104, 4, t0, "purchase"),
    ]
    tbl = pa.table({
        "event_id": pa.array([e[0] for e in ev], pa.int64()),
        "ts": pa.array([e[2] for e in ev], pa.timestamp("us")),
        "user_id": pa.array([e[1] for e in ev], pa.int64()),
        "event_type": pa.array([e[3] for e in ev], pa.string()),
        "value": pa.array([1.0] * len(ev), pa.float64()),
        "props": pa.array(["{}"] * len(ev), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = all_queries()["asof_forward_tolerance"].fn(spark, str(tmp_path))
    got = {r["signup_id"]: r["purchase_id"] for r in out.collect()}
    assert got == {1: 101, 2: None, 3: None, 4: 104}


def test_bpe_train_merges_planted_greedy_semantics(spark, tmp_path):
    """Planted corpus exercising the sharp edges of BPE merge learning:
    self-pairs in runs ('x x x' contributes TWO (x,x) pair counts but a
    greedy rewrite merges only floor(run/2) of them), count ties broken
    lexicographically, and later merges built on earlier merged tokens.
    Compared against an independent sequential Python reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from redpanda_iceberg_duckdb_spark.operators.bpe_train import _N_MERGES

    docs = [
        "x x x x x b b",
        "x x b b c c c",
        "a b a b a b",
        "c a c a b b",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["t"] * len(docs), pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    def ref_merges():
        corpus = [d.split(" ") for d in docs]
        out = []
        for rank in range(1, _N_MERGES + 1):
            counts: dict[tuple[str, str], int] = {}
            for toks in corpus:
                for i in range(len(toks) - 1):
                    counts[(toks[i], toks[i + 1])] = counts.get(
                        (toks[i], toks[i + 1]), 0) + 1
            if not counts:
                break
            (l, r), c = min(counts.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            out.append((rank, l, r, c))
            merged = []
            for toks in corpus:
                nt, i = [], 0
                while i < len(toks):
                    if (i + 1 < len(toks)
                            and toks[i] == l and toks[i + 1] == r):
                        nt.append(f"{l}@{r}")
                        i += 2
                    else:
                        nt.append(toks[i])
                        i += 1
                merged.append(nt)
            corpus = merged
        return out

    got = [(r["merge_rank"], r["left_tok"], r["right_tok"],
            r["pair_count"])
           for r in all_queries()["bpe_train_merges"]
           .fn(spark, str(tmp_path)).collect()]
    assert got == ref_merges()
