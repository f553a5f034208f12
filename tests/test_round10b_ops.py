"""Round-10 late-batch targeted tests: planted signals for the KS /
ANOVA / ACF / CCF tier (the oracle parity runs live in
test_operator_oracles.py; these prove the statistics MOVE the right way
on constructed data)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.registry import all_queries


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _events_dir(tmp_path, spark, rows):
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    _write_events(spark, f"{d}/events.parquet", rows)
    return d


def test_ks_detects_planted_location_shift(spark, tmp_path):
    """purchase ~ flat on [10,20), click ~ flat on [30,40): disjoint
    supports => KS distance exactly 1; same support => small KS."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        rows.append((i, t0, 1, "purchase", 10.0 + (i % 10), ""))
        rows.append((1000 + i, t0, 1, "click", 30.0 + (i % 10), ""))
    d = _events_dir(tmp_path, spark, rows)
    out = all_queries()["ks_two_sample_value"].fn(spark, d).collect()[0]
    assert out["ks_stat"] == 1.0
    assert out["n1"] == 200 and out["n2"] == 200

    rows2 = [(i, t0, 1, ("purchase" if i % 2 else "click"),
              10.0 + ((i // 2) % 10), "") for i in range(400)]
    d2 = _events_dir(tmp_path / "same", spark, rows2)
    out2 = all_queries()["ks_two_sample_value"].fn(spark, d2).collect()[0]
    assert out2["ks_stat"] == 0.0


def test_anova_separated_groups_dwarf_within_noise(spark, tmp_path):
    """Five groups at means 10/20/30/40/50 with +-1 cent jitter: the
    between-group SS must dominate (eta^2 ~ 1, F huge); identical
    groups give F ~ 0."""
    t0 = dt.datetime(2024, 1, 1)
    types = ["click", "error", "purchase", "signup", "view"]
    rows = []
    for g, ty in enumerate(types):
        for i in range(50):
            rows.append((g * 100 + i, t0, 1, ty,
                         10.0 * (g + 1) + 0.01 * (i % 2), ""))
    d = _events_dir(tmp_path, spark, rows)
    out = all_queries()["anova_f_oneway"].fn(spark, d).collect()[0]
    assert out["k"] == 5 and out["n"] == 250
    assert out["eta_sq"] > 0.999
    assert out["f_stat"] > 1e5

    flat = [(i, t0, 1, types[i % 5], 25.0 + 0.01 * (i % 3), "")
            for i in range(250)]
    d2 = _events_dir(tmp_path / "flat", spark, flat)
    out2 = all_queries()["anova_f_oneway"].fn(spark, d2).collect()[0]
    assert out2["eta_sq"] < 0.05


def test_acf_finds_planted_period(spark, tmp_path):
    """Hourly counts alternating 1,1,21 (period 3): acf at lag 3 must be
    strongly positive and larger than at lags 1 and 2."""
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for h in range(72):
        n = 21 if h % 3 == 0 else 1
        for _ in range(n):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1,
                         "view", 1.0, ""))
            eid += 1
    d = _events_dir(tmp_path, spark, rows)
    acf = {r["lag"]: r["acf"]
           for r in all_queries()["acf_hourly_lags"].fn(spark, d).collect()}
    assert acf[3] > 0.9
    assert acf[3] > acf[1] and acf[3] > acf[2]
    assert acf[6] > 0.8  # harmonic of the period


def test_ccf_locates_planted_lead(spark, tmp_path):
    """view bursts at hours h in B; purchase bursts at h+3: the CCF must
    peak at lag +3 (views lead purchases by 3 hours)."""
    t0 = dt.datetime(2024, 1, 1)
    bursts = {4, 11, 23, 37, 52}
    rows, eid = [], 0
    for h in range(72):
        nv = 15 if h in bursts else 1
        np_ = 15 if (h - 3) in bursts else 1
        for _ in range(nv):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1,
                         "view", 1.0, ""))
            eid += 1
        for _ in range(np_):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1,
                         "purchase", 1.0, ""))
            eid += 1
    d = _events_dir(tmp_path, spark, rows)
    ccf = {r["lag"]: r["ccf"]
           for r in all_queries()["crosscorr_lead_lag"].fn(spark, d).collect()}
    peak = max(ccf, key=lambda k: ccf[k])
    assert peak == 3, f"CCF peaked at {peak}, expected +3: {ccf}"
    assert ccf[3] > 0.8


def test_ndcg_idcg_is_the_graded_multiset_constant(spark):
    """By construction the graded relevance multiset of every probe with
    >=10 exact neighbors is {3, 2x4, 1x5}; IDCG must equal its fixed
    integer value and NDCG must sit in (0, 1]."""
    import math

    w = {i: round(1e6 / math.log2(i + 1)) for i in range(1, 11)}
    idcg_const = (3 * w[1] + 2 * (w[2] + w[3] + w[4] + w[5])
                  + sum(w[i] for i in range(6, 11)))
    rows = all_queries()["ndcg_at_10"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "no probe queries at sf0.001"
    for r in rows:
        assert r["idcg_scaled"] == idcg_const
        assert 0 <= r["ndcg_at_10"] <= 1.0
        assert 0 <= r["dcg_scaled"] <= r["idcg_scaled"]


def test_neyman_allocates_by_n_times_sd(spark, tmp_path):
    """Two equal-size strata, sd ratio 3:1 (values +-3 vs +-1 around the
    mean): the noisier stratum must get ~3x the budget, and the
    allocations must sum to the budget exactly."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(300):
        rows.append((i, t0, 1, "click", 50.0 + (3 if i % 2 else -3), ""))
        rows.append((1000 + i, t0, 1, "view",
                     50.0 + (1 if i % 2 else -1), ""))
    d = _events_dir(tmp_path, spark, rows)
    out = {r["event_type"]: r for r in
           all_queries()["neyman_allocation"].fn(spark, d).collect()}
    assert sum(r["alloc"] for r in out.values()) == 1000
    assert out["click"]["alloc"] == 750  # 3:1 weight split of 1000
    assert out["view"]["alloc"] == 250


def test_multitouch_credits_known_path_exactly(spark, tmp_path):
    """One user, path view->click->error->view then purchase: U-shaped
    credits must be first 0.4, last 0.4, middles 0.1 each — and the
    nano-credit total must equal exactly one conversion."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=0), 7, "view", 1.0, ""),
        (2, t0 + dt.timedelta(minutes=1), 7, "click", 1.0, ""),
        (3, t0 + dt.timedelta(minutes=2), 7, "error", 1.0, ""),
        (4, t0 + dt.timedelta(minutes=3), 7, "view", 1.0, ""),
        (5, t0 + dt.timedelta(minutes=4), 7, "purchase", 9.0, ""),
        # a second user with no pre-purchase touches contributes nothing
        (6, t0, 8, "purchase", 5.0, ""),
    ]
    d = _events_dir(tmp_path, spark, rows)
    out = {r["event_type"]: r for r in
           all_queries()["multitouch_attribution"].fn(spark, d).collect()}
    assert set(out) == {"view", "click", "error"}
    # first view 400M + last view 400M; click/error 100M each
    assert out["view"]["credit_nanos"] == 800_000_000
    assert out["click"]["credit_nanos"] == 100_000_000
    assert out["error"]["credit_nanos"] == 100_000_000
    assert sum(r["credit_nanos"] for r in out.values()) == 1_000_000_000
    assert out["view"]["n_first"] == 1 and out["view"]["n_last"] == 1


def test_snm_catches_planted_adjacent_dup(spark, tmp_path):
    """Two docs sharing a long prefix and ~all 5-grams must rank
    adjacently (dist=1) and verify; unrelated docs must not verify."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    rows = [
        (1, base + "end one", "en", "s1", len(base) + 7),
        (2, base + "end two", "en", "s1", len(base) + 7),
        (3, "completely different text about spark query engines and "
            "columnar vectorized execution pipelines for analytics "
            "workloads at scale with shuffles and joins", "en", "s2", 150),
        (4, "yet another unrelated document mentioning kafka topics "
            "brokers partitions offsets consumer groups and exactly "
            "once delivery semantics in streams", "en", "s3", 140),
    ]
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").coalesce(1).write.mode("overwrite") \
        .parquet(f"{d}/documents.parquet")
    out = {r["dist"]: r for r in
           all_queries()["sorted_neighborhood_pairs"].fn(spark, d).collect()}
    assert out[1]["n_verified"] == 1   # the planted pair, adjacent ranks
    assert all(r["n_verified"] == 0 for k, r in out.items() if k != 1)


def test_snm_finds_real_neardups_at_sf001(spark):
    """On the shipped corpus the near-dup mass must sit at dist=1 and
    candidates must be exactly N-d per distance (rank-window algebra)."""
    rows = all_queries()["sorted_neighborhood_pairs"].fn(
        spark, "/root/testdata/sf0.01").collect()
    n_docs = 500
    by_d = {r["dist"]: r for r in rows}
    for dd, r in by_d.items():
        assert r["n_candidates"] == n_docs - dd
    assert by_d[1]["n_verified"] > 0, "prefix-sorted dups not adjacent?"
    assert by_d[1]["n_verified"] >= max(
        r["n_verified"] for dd, r in by_d.items() if dd > 1)


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, [64 floats], label)."""
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_dbscan_grid_catches_cross_cell_pairs(spark, tmp_path):
    """A 6-point tight blob (all core), a lone point 0.015 from the blob
    edge ACROSS a grid-cell boundary (border — proves the 3x3 cell
    neighborhood loses nothing), and a far point (noise)."""
    def v(x, y):
        return [float(x), float(y)] + [0.0] * 62

    rows = []
    # blob straddling the cell boundary at x=0 (cells -1 and 0)
    for k, (x, y) in enumerate([(-0.005, 0.0), (-0.002, 0.004),
                                (0.003, 0.001), (0.006, -0.003),
                                (-0.007, -0.004), (0.001, 0.006)]):
        rows.append((k, v(x, y), 0))
    rows.append((10, v(0.021, 0.0), 0))   # within eps of blob pts >= x=0.006
    rows.append((11, v(0.3, 0.3), 0))     # isolated
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    _write_embeddings(spark, f"{d}/embeddings.parquet", rows)
    out = {r["point_class"]: r["n_points"] for r in
           all_queries()["dbscan_grid_labels"].fn(spark, d).collect()}
    assert out.get("core", 0) == 6
    assert out.get("border", 0) == 1
    assert out.get("noise", 0) == 1


def test_itemcf_perfect_copurchase_ranks_first(spark, tmp_path):
    """Parts 0 and 1 are bought by exactly the same 8 customers (cosine
    1.0); part 2 overlaps part 0 in only 2 of 8 baskets — rank 1 for
    probe 0 must be part 1."""
    orders, lineitem, oid = [], [], 0
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    for c in range(8):
        oid += 1
        orders.append((oid, c, "O", 1.0, t0, "1-URGENT"))
        parts = [0, 1] + ([2] if c < 2 else [3])
        for ln, p in enumerate(parts, 1):
            lineitem.append((oid, p, 0, ln, 1.0, 1.0, 0.0, 0.0,
                             "N", "O", t0))
    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, "
                "o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long, l_suppkey long, "
                  "l_linenumber int, l_quantity double, "
                  "l_extendedprice double, l_discount double, "
                  "l_tax double, l_returnflag string, "
                  "l_linestatus string, l_shipdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    rows = all_queries()["item_item_cosine_recs"].fn(spark, d).collect()
    top = {(r["probe_part"], r["rank"]): r for r in rows}
    assert top[(0, 1)]["similar_part"] == 1
    assert top[(0, 1)]["cosine"] == 1.0
    assert top[(0, 1)]["co_count"] == 8
    assert top[(0, 2)]["cosine"] < 1.0


def _write_purchases(spark, d, baskets):
    """baskets: {custkey: [partkeys]} -> orders + lineitem parquet."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    orders, lineitem, oid = [], [], 0
    for c, parts in baskets.items():
        oid += 1
        orders.append((oid, c, "O", 1.0, t0, "1-URGENT"))
        for ln, p in enumerate(parts, 1):
            lineitem.append((oid, p, 0, ln, 1.0, 1.0, 0.0, 0.0,
                             "N", "O", t0))
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, "
                "o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long, l_suppkey long, "
                  "l_linenumber int, l_quantity double, "
                  "l_extendedprice double, l_discount double, "
                  "l_tax double, l_returnflag string, "
                  "l_linestatus string, l_shipdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")


def test_bfs_path_graph_and_pop_cap(spark, tmp_path):
    """Chain 1-2-3-4-5-6 via rare parts: hops 0..4 from landmark 1,
    customer 6 at hop 5 is beyond the cap -> unreachable (-1), like the
    isolated customer 9. A POPULAR part (27 buyers > cap 25) shared by
    ALL of them must NOT shortcut the chain."""
    baskets = {}
    # chain links: part 100+i shared by customers i+1 and i+2 only
    for i in range(5):
        baskets.setdefault(i + 1, []).append(100 + i)
        baskets.setdefault(i + 2, []).append(100 + i)
    baskets[9] = [999]  # isolated: its part is bought by nobody else
    # the hub part 500: bought by the chain + 20 fillers -> pop 27 > 25
    for c in list(baskets) + [c + 50 for c in range(20)]:
        baskets.setdefault(c, []).append(500)
    d = str(tmp_path / "ds")
    _write_purchases(spark, d, baskets)
    out = {r["hops"]: r["n_customers"] for r in
           all_queries()["bfs_hop_distance"].fn(spark, d).collect()}
    # landmark is customer 1 (smallest edge endpoint)
    assert out[0] == 1 and out[1] == 1 and out[2] == 1
    assert out[3] == 1 and out[4] == 1
    # customer 6 (hop 5 > cap) + customer 9 + the 20 fillers: all -1
    assert out[-1] == 22


def test_hits_whale_hub_and_popular_authority(spark, tmp_path):
    """Customer 1 buys every part (max hub); part 100 is bought by all
    customers (max authority); exact integer scores."""
    baskets = {1: list(range(100, 110))}
    for c in range(2, 8):
        baskets[c] = [100, 100 + (c % 3)]
    d = str(tmp_path / "ds")
    _write_purchases(spark, d, baskets)
    rows = all_queries()["hits_hubs_authorities"].fn(spark, d).collect()
    hub1 = [r for r in rows if r["role"] == "hub" and r["rank"] == 1][0]
    auth1 = [r for r in rows
             if r["role"] == "authority" and r["rank"] == 1][0]
    assert hub1["node_id"] == 1
    assert auth1["node_id"] == 100
    assert hub1["score"] > 0 and auth1["score"] > 0


def test_kruskal_wallis_separated_vs_identical(spark, tmp_path):
    """Cleanly separated groups give H near its k-1-group maximum;
    identical groups (all values equal) are all one tie run and H = 0
    (tie-corrected H is 0/0-guarded by construction: corr > 0 unless
    EVERYTHING ties — use near-identical instead)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    types = ["click", "error", "purchase", "signup", "view"]
    rows = []
    for g, ty in enumerate(types):
        for i in range(40):
            rows.append((g * 100 + i, t0, 1, ty, 10.0 * (g + 1), ""))
    d = _events_dir(tmp_path, spark, rows)
    out = all_queries()["kruskal_wallis_value"].fn(spark, d).collect()[0]
    assert out["n"] == 200 and out["k"] == 5
    assert out["h_tie_corrected"] > 150  # ~ n-1 scale for clean separation

    rows2 = [(i, t0, 1, types[i % 5], 25.0 + 0.01 * (i % 2), "")
             for i in range(200)]
    d2 = _events_dir(tmp_path / "flat", spark, rows2)
    out2 = all_queries()["kruskal_wallis_value"].fn(spark, d2).collect()[0]
    assert abs(out2["h_tie_corrected"]) < 5


def test_permutation_test_p_values_move_correctly(spark, tmp_path):
    """Disjoint supports: the observed diff beats (almost) every random
    relabeling -> tiny p. Zero observed diff: every permutation is at
    least as extreme -> p = 1."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(150):
        rows.append((i, t0, 1, "purchase", 100.0 + (i % 5), ""))
        rows.append((1000 + i, t0, 1, "click", 10.0 + (i % 5), ""))
    d = _events_dir(tmp_path, spark, rows)
    out = all_queries()["hash_permutation_test"].fn(spark, d).collect()[0]
    assert out["n_perms"] == 64
    assert out["p_value"] <= 3 / 65  # at most a couple of lucky perms

    rows2 = []
    for i in range(150):
        rows2.append((i, t0, 1, "purchase", 42.0, ""))
        rows2.append((1000 + i, t0, 1, "click", 42.0, ""))
    d2 = _events_dir(tmp_path / "null", spark, rows2)
    out2 = all_queries()["hash_permutation_test"].fn(spark, d2).collect()[0]
    assert out2["p_value"] == 1.0
