"""Round-10 second pending-batch targeted tests: planted structures for
k-core peeling, label propagation, and BH-FDR (oracle parity runs live in
test_operator_oracles.py; these prove each operator MOVES the right way
on constructed data)."""

from __future__ import annotations

import datetime as dt
import os

from redpanda_iceberg_duckdb_spark.registry import all_queries


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _graph_dir(tmp_path, spark, cust_parts):
    """cust_parts: list of (custkey, partkey) purchases; one order per
    customer carrying all their lines."""
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1)
    custs = sorted({c for c, _ in cust_parts})
    od = [(c, c, "O", 100.0, t0, "1-URGENT") for c in custs]
    li = [(c, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", t0)
          for i, (c, p) in enumerate(cust_parts)]
    _write(spark, f"{d}/orders.parquet", od,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    _write(spark, f"{d}/lineitem.parquet", li,
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate timestamp")
    return d


# ---------------------------------------------------------------- graph10d

def test_kcore_keeps_clique_peels_pendants(spark, tmp_path):
    """K4 clique (customers 1-4 share part 1) plus a pendant chain hung off
    it (4-5 via part 2, path 6-7-8 via parts 3/4): the 3-core must be
    exactly the clique — peeling removes the chain in one round and the
    bridge endpoint's degree falls back to 3."""
    cp = [(c, 1) for c in (1, 2, 3, 4)]
    cp += [(4, 2), (5, 2)]
    cp += [(6, 3), (7, 3), (7, 4), (8, 4)]
    d = _graph_dir(tmp_path, spark, cp)
    out = all_queries()["kcore_degree_histogram"].fn(spark, d).collect()
    assert [(r["core_degree"], r["n_customers"]) for r in out] == [(3, 4)]


def test_lpa_two_cliques_two_communities(spark, tmp_path):
    """Two disjoint cliques of sizes 5 and 6: four min-tie-break rounds
    converge each clique onto its smallest member's label, so the size
    histogram is exactly {5: 1, 6: 1}."""
    cp = [(c, 1) for c in range(1, 6)]          # clique of 5 on part 1
    cp += [(c, 2) for c in range(11, 17)]       # clique of 6 on part 2
    d = _graph_dir(tmp_path, spark, cp)
    out = all_queries()["label_propagation_sizes"].fn(spark, d).collect()
    assert [(r["community_size"], r["n_communities"]) for r in out] == \
        [(5, 1), (6, 1)]


# ---------------------------------------------------------------- stats10d

def test_bh_rejects_exactly_the_shifted_type_pairs(spark, tmp_path):
    """Four event types share a constant value while 'purchase' sits 4
    orders of magnitude away: BH at alpha=0.2 must reject exactly the four
    purchase pairs (p_num = 1 each) and keep the six identical-mean pairs
    (observed diff 0 -> every replicate is extreme -> p = 1)."""
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for ty in ["click", "error", "signup", "view"]:
        for _ in range(400):
            rows.append((eid, t0, eid % 97, ty, 100.0, ""))
            eid += 1
    for _ in range(400):
        rows.append((eid, t0, eid % 97, "purchase", 1_000_000.0, ""))
        eid += 1
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    out = all_queries()["bh_fdr_discoveries"].fn(spark, d).collect()
    assert len(out) == 10
    rejected = {r["pair"] for r in out if r["rejected"] == 1}
    assert rejected == {p for p in
                        (r["pair"] for r in out) if "purchase" in p}
    for r in out:
        if "purchase" in r["pair"]:
            assert r["p_num"] == 1
        else:
            assert r["p_num"] == 100


# ---------------------------------------------------------------- graph10e

def test_sssp_weighted_chain_and_hop_cap(spark, tmp_path):
    """A weighted 8-node chain c1-s1-c2-s2-c3-s3-c4-s4 with doubling
    prices: distances must be the exact prefix sums, the duplicate
    higher-priced (c1,s1) line must lose to the min, and s4 at hop 7 must
    fall outside the 6-round horizon (reached count 7)."""
    import datetime as dt
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1)
    # orders: one per customer
    od = [(c, c, "O", 1.0, t0, "1-URGENT") for c in (1, 2, 3, 4)]
    lines = [(1, 1, 1.0), (1, 1, 5.0),          # duplicate: min wins
             (2, 1, 2.0), (2, 2, 4.0),
             (3, 2, 8.0), (3, 3, 16.0),
             (4, 3, 32.0), (4, 4, 64.0)]
    li = [(ok, 1, sk, i, 1.0, px, 0.0, 0.0, "N", "O", t0)
          for i, (ok, sk, px) in enumerate(lines)]
    _write(spark, f"{d}/orders.parquet", od,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    _write(spark, f"{d}/lineitem.parquet", li,
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate timestamp")
    out = all_queries()["sssp_cheapest_paths"].fn(spark, d).collect()
    got = [(r["rnk"], r["node_id"], r["dist"]) for r in out]
    assert got == [(1, 2, 0), (2, 3, 100), (3, 4, 300), (4, 5, 700),
                   (5, 6, 1500), (6, 7, 3100), (7, 8, 6300),
                   (11, -1, 7)], got


# --------------------------------------------------------------- privacy10

def test_tcloseness_uniform_minority_vs_skewed_majority(spark, tmp_path):
    """Day 1: 100 click events uniform over bands 0-9. Day 2: 900 events
    all in band 9. The global mix is band-9-heavy, so the UNIFORM minority
    day is the distant one: t = 0.45 exactly; the majority day sits at
    t = 0.05. Exactly one group crosses the t > 1/5 flag."""
    import datetime as dt
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    rows = []
    for i in range(100):                       # day 1: uniform bands 0..9
        rows.append((i, dt.datetime(2024, 1, 1, 12), i % 97, "click",
                     (i % 10) * 100.0 + 50.0, ""))
    for i in range(900):                       # day 2: all band 9
        rows.append((1000 + i, dt.datetime(2024, 1, 2, 12), i % 97,
                     "click", 950.0, ""))
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    out = all_queries()["t_closeness_audit"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_groups"] == 2
    assert abs(r["worst_t"] - 0.45) < 1e-9
    assert r["n_over_fifth"] == 1
    assert r["rows_exposed"] == 100


# -------------------------------------------------------------- mixture10b

def test_temperature_allocation_sqrt_rebalances_100_to_1(spark, tmp_path):
    """Sources with a 100:1 token ratio (10000 vs 100): natural shares
    0.9901/0.0099, but sqrt weights are 10000 vs 1000 so the tempered
    split is 10:1 — and the largest-remainder slot goes to the small
    source (9091 + 90909 = 100000 exactly)."""
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    rows = []
    for i in range(100):                       # big: 100 docs x 100 tokens
        rows.append((i, " ".join(f"w{j}" for j in range(100)),
                     "en", "big", 100))
    for i in range(10):                        # small: 10 docs x 10 tokens
        rows.append((1000 + i, " ".join(f"w{j}" for j in range(10)),
                     "en", "small", 10))
    _write(spark, f"{d}/documents.parquet", rows,
           "doc_id long, text string, lang string, source string, "
           "n_chars long")
    out = {r["source"]: r for r in
           all_queries()["temperature_mixture_allocation"].fn(spark,
                                                              d).collect()}
    assert out["big"]["n_tok"] == 10000 and out["small"]["n_tok"] == 100
    assert out["big"]["weight"] == 10000 and out["small"]["weight"] == 1000
    assert out["big"]["alloc"] == 90909 and out["small"]["alloc"] == 9091
    assert out["big"]["alloc"] + out["small"]["alloc"] == 100000


# ------------------------------------------------------------------ sprt10

def test_sprt_crosses_correct_boundary_each_way(spark, tmp_path):
    """30% converting stream must accept H1; 10% must accept H0 — and the
    decision day must come before the stream's last day in both cases
    (the whole point of sequential testing)."""
    import datetime as dt
    for rate, want in [(3, "accept_h1"), (1, "accept_h0")]:
        d = str(tmp_path / f"ds{rate}")
        os.makedirs(d, exist_ok=True)
        rows = []
        eid = 0
        for day in range(1, 21):                  # 20 days x 500 events
            for i in range(500):
                ty = "purchase" if i % 10 < rate else "click"
                rows.append((eid, dt.datetime(2024, 1, day, 12), eid % 97,
                             ty, 1.0, ""))
                eid += 1
        _write(spark, f"{d}/events.parquet", rows,
               "event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string")
        r = all_queries()["sprt_sequential_decision"].fn(spark, d).collect()
        assert len(r) == 1
        assert r[0]["decision"] == want, (rate, r)
        assert r[0]["decision_day"] < dt.datetime(2024, 1, 20), (rate, r)


# ----------------------------------------------------------------- shard10

def test_hrw_minimal_disruption_identity(spark, tmp_path):
    """Adding shard 8 must move EXACTLY the keys shard 8 wins: every
    original shard's count only shrinks, the shrinkage sums to shard 8's
    gain, and the gain is near n/9 for 900 uniform keys."""
    import datetime as dt
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    rows = [(i, dt.datetime(2024, 1, 1), i, "click", 1.0, "")
            for i in range(900)]
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    out = all_queries()["rendezvous_shard_audit"].fn(spark, d).collect()
    by = {r["shard"]: r for r in out}
    assert by[8]["n_keys_8"] == 0
    moved = by[8]["n_keys_9"]
    shrink = sum(by[s]["n_keys_8"] - by[s]["n_keys_9"] for s in range(8))
    assert shrink == moved                       # minimal disruption
    assert all(by[s]["n_keys_9"] <= by[s]["n_keys_8"] for s in range(8))
    assert sum(by[s]["n_keys_8"] for s in range(8)) == 900
    assert 40 <= moved <= 170                    # ~100 expected at n/9


# ---------------------------------------------------------------- binseg10

def test_binseg_finds_square_wave_breaks(spark, tmp_path):
    """96-hour square wave 10/50/10/50 (breaks after hours 24, 48, 72):
    level 1 picks the first break (tie with hour 72 goes to the earlier),
    the constant left half refuses to split (gain 0), the right half picks
    hour 48 — exactly three segments with exact totals."""
    import datetime as dt
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1)
    for h in range(96):
        level = 10 if (h // 24) % 2 == 0 else 50
        for _ in range(level):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=30),
                         eid % 97, "click", 1.0, ""))
            eid += 1
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    out = [(r["seg"], r["n_hours"], r["total_events"]) for r in
           all_queries()["binary_segmentation_splits"].fn(spark,
                                                          d).collect()]
    assert out == [(1, 24, 240), (2, 24, 1200), (3, 48, 1440)], out


def test_binseg_constant_series_single_segment(spark, tmp_path):
    """A constant series has zero gain everywhere: no split is accepted
    and the whole series is one segment."""
    import datetime as dt
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(h * 10 + i, t0 + dt.timedelta(hours=h, minutes=7), i,
             "click", 1.0, "")
            for h in range(48) for i in range(5)]
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    out = all_queries()["binary_segmentation_splits"].fn(spark, d).collect()
    assert len(out) == 1
    assert out[0]["n_hours"] == 48 and out[0]["total_events"] == 240
