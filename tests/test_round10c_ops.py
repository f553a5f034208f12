"""Round-10 pending-batch targeted tests: planted signals for the basket /
sweep-line / NB / surprisal / Heaps / conformal / k-center / AMS tier
(oracle parity runs live in test_operator_oracles.py; these prove each
operator MOVES the right way on constructed data)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.registry import all_queries


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _mkdir(tmp_path, name="ds"):
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    return d


# ---------------------------------------------------------------- basket10

def test_apriori_planted_perfect_pair(spark, tmp_path):
    """Brands X and Y co-occur in every one of 40 baskets; Z rides alone in
    another 40. (X,Y) must surface with confidence 1 in both directions'
    worth of counts and lift = n_baskets / c_Y = 2."""
    d = _mkdir(tmp_path)
    li, pt = [], []
    # parts: partkey 1 -> brand X, 2 -> brand Y, 3 -> brand Z
    for pk, br in [(1, "Brand#X"), (2, "Brand#Y"), (3, "Brand#Z")]:
        pt.append((pk, f"part{pk}", br, "t", 1, 1.0))
    for ok in range(40):
        li.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                   dt.datetime(2024, 1, 1)))
        li.append((ok, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                   dt.datetime(2024, 1, 1)))
    for ok in range(40, 80):
        li.append((ok, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                   dt.datetime(2024, 1, 1)))
    _write(spark, f"{d}/lineitem.parquet", li,
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate timestamp")
    _write(spark, f"{d}/part.parquet", pt,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    out = all_queries()["basket_frequent_pairs"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"]) == ("Brand#X", "Brand#Y")
    assert r["support_cnt"] == 40
    assert r["conf_a_to_b"] == 1.0
    assert r["lift"] == 2.0          # 40 * 80 / (40 * 40)


def test_sweepline_known_peak(spark, tmp_path):
    """Three order lines open Jan 2-4 and all ship Jan 10: concurrency
    climbs 1,2,3 then drops to 0 — January's peak is 3 reached on the 4th."""
    d = _mkdir(tmp_path)
    li, od = [], []
    for i, day in enumerate([2, 3, 4]):
        od.append((i, 1, "O", 100.0, dt.datetime(2024, 1, day), "1-URGENT"))
        li.append((i, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                   dt.datetime(2024, 1, 10)))
    _write(spark, f"{d}/orders.parquet", od,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    _write(spark, f"{d}/lineitem.parquet", li,
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate timestamp")
    out = all_queries()["max_concurrent_open_lines"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ym"] == 202401
    assert r["peak_open"] == 3
    assert r["peak_date"] == dt.date(2024, 1, 4)


# ------------------------------------------------------------------ nblm10

def _docs_dir(tmp_path, spark, rows):
    d = _mkdir(tmp_path)
    _write(spark, f"{d}/documents.parquet", rows,
           "doc_id long, text string, lang string, source string, "
           "n_chars long")
    return d


def test_nb_separable_vocab_is_diagonal(spark, tmp_path):
    """Each lang uses a disjoint vocabulary: the NB confusion matrix must
    be exactly diagonal (every held-out doc classified correctly)."""
    langs = ["de", "en", "es", "fr", "zh"]
    rows = []
    for i in range(200):
        lg = langs[i % 5]
        rows.append((i, f"tok_{lg} tok_{lg} tok_{lg}2 tok_{lg}3",
                     lg, "s0", 10))
    d = _docs_dir(tmp_path, spark, rows)
    out = all_queries()["naive_bayes_lang_confusion"].fn(spark, d).collect()
    assert len(out) > 0
    for r in out:
        assert r["actual"] == r["predicted"], out


def test_surprisal_repetitive_doc_lands_lower_band(spark, tmp_path):
    """A corpus of one dominant repeated bigram plus one doc of rare
    bigrams: the repetitive docs must land in a strictly lower surprisal
    band than the rare-bigram doc."""
    rows = [(i, "a b a b a b a b a b", "en", "rep", 10) for i in range(30)]
    rows.append((99, "q r s t u v w x y z", "en", "rare", 10))
    d = _docs_dir(tmp_path, spark, rows)
    out = all_queries()["bigram_surprisal_bands"].fn(spark, d).collect()
    bands = {r["source"]: r["band"] for r in out}
    assert bands["rep"] < bands["rare"]


def test_heaps_unique_trigrams_give_beta_one(spark, tmp_path):
    """Every doc contributes all-distinct trigrams (vocab grows linearly
    with tokens): the fitted exponent must be ~1. The fixture corpus's
    finite vocab must fit strictly below 1."""
    rows = []
    tok = 0
    for i in range(64):
        words = [f"w{tok + j}" for j in range(12)]
        tok += 12
        rows.append((i, " ".join(words), "en", "s0", 10))
    d = _docs_dir(tmp_path, spark, rows)
    r = all_queries()["heaps_law_fit"].fn(spark, d).collect()[0]
    assert abs(r["beta"] - 1.0) < 0.05
    assert r["n_levels"] == 5

    sf = "/root/testdata/sf0.001"
    rf = all_queries()["heaps_law_fit"].fn(spark, sf).collect()[0]
    assert 0.0 < rf["beta"] < 1.0


# ------------------------------------------------------------- conformal10

def _orders_dir(tmp_path, spark, rows):
    d = _mkdir(tmp_path)
    _write(spark, f"{d}/orders.parquet", rows,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, "
           "o_orderpriority string")
    return d


def test_conformal_coverage_honors_promise_and_detects_shift(spark,
                                                             tmp_path):
    """Exchangeable folds: empirical coverage must sit near/above the
    1 - alpha = 0.8 promise. Then shift every 'test-fold' row far outside
    the train distribution (the hash split is on o_orderkey, so keys with
    h >= 8 are the test fold): coverage must collapse to ~0."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, "O", 100.0 + (i % 50), t0, "1-URGENT")
            for i in range(2000)]
    d = _orders_dir(tmp_path, spark, rows)
    out = all_queries()["conformal_interval_coverage"].fn(spark, d).collect()
    assert len(out) == 1
    assert out[0]["coverage"] >= 0.7

    from redpanda_iceberg_duckdb_spark.functions.hashing import md5_mod_spark
    h = md5_mod_spark("concat('cf:', cast(o_orderkey as string))", 10)
    df = spark.read.parquet(f"{d}/orders.parquet").withColumn(
        "o_totalprice",
        F.when(F.expr(h) >= 8, F.col("o_totalprice") + 100000.0)
        .otherwise(F.col("o_totalprice")))
    d2 = _mkdir(tmp_path, "shifted")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d2}/orders.parquet")
    out2 = all_queries()["conformal_interval_coverage"].fn(spark,
                                                           d2).collect()
    assert out2[0]["coverage"] == 0.0


# --------------------------------------------------------------- kcenter10

def test_kcenter_picks_one_per_separated_cluster(spark, tmp_path):
    """Four tight clusters at the corners of a big square (dim 4): the
    4 chosen seeds must come from 4 DIFFERENT clusters and the covering
    radius^2 must be the within-cluster jitter, orders below the
    between-cluster distance."""
    d = _mkdir(tmp_path)
    corners = [(0.9, 0.9), (0.9, -0.9), (-0.9, 0.9), (-0.9, -0.9)]
    rows = []
    vid = 0
    for ci, (cx, cy) in enumerate(corners):
        for j in range(25):
            jit = 0.0001 * j
            rows.append((vid, [cx + jit, cy, 0.0, 0.0], ci))
            vid += 1
    _write(spark, f"{d}/embeddings.parquet", rows,
           "vec_id long, embedding array<float>, label int")
    out = all_queries()["kcenter_farthest_points"].fn(spark, d).collect()
    seeds = [r for r in out if r["rnk"] <= 4]
    clusters = {r["vec_id"] // 25 for r in seeds}
    assert len(clusters) == 4, out
    radius_row = [r for r in out if r["rnk"] == 5][0]
    # within-cluster spread (<= (25*0.0001*1e4)^2 = 625) vs between-cluster
    # lattice distance (~(1.8e4)^2): the covering radius is the former.
    assert radius_row["sel_d2"] <= 1000
    assert min(r["sel_d2"] for r in seeds if r["rnk"] > 1) > 1_000_000


# -------------------------------------------------------------- sketches10

def test_ams_concentrates_on_skewed_stream(spark, tmp_path):
    """One whale user (1000 events) + 200 singletons: F2 = 1e6 + 200
    exactly; the 16-estimator mean must land within 50% relative error
    (the tug-of-war variance bound at J = 16 makes this comfortable)."""
    d = _mkdir(tmp_path)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "click", 1.0, "") for i in range(1000)]
    rows += [(10_000 + u, t0, 100 + u, "view", 1.0, "") for u in range(200)]
    _write(spark, f"{d}/events.parquet", rows,
           "event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    r = all_queries()["ams_f2_sketch"].fn(spark, d).collect()[0]
    assert r["n_users"] == 201
    assert r["f2"] == 1_000_000 + 200
    assert r["rel_error"] < 0.5
