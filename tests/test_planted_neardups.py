"""The driver's embeddings table contains no true near-duplicates (max pair
cosine ~0.60), so embedding_near_dup_pairs correctly returns empty there.
This test plants real near-dups in a synthetic embeddings.parquet and proves
the operator (and its DuckDB oracle, on the same file) detects exactly them."""

from __future__ import annotations

import numpy as np

from redpanda_iceberg_duckdb_spark.registry import all_queries

from .oracle_harness import run_compare


def _planted_dir(tmp_path, spark):
    rng = np.random.RandomState(7)
    base = rng.normal(size=(40, 64)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], i % 10))
    # 5 near-dup clones: tiny perturbation of vectors 0..4 -> cosine ~0.9997.
    # Noise only on dims 16+ — the sign-LSH buckets on dims 0..15, and a
    # perturbed value crossing zero there would (correctly, by LSH contract)
    # drop the pair from the candidate set.
    for j in range(5):
        noise = np.zeros(64, dtype=np.float32)
        noise[16:] = rng.normal(scale=0.01, size=48).astype(np.float32)
        clone = base[j] + noise
        rows.append((100 + j, [float(x) for x in clone.astype(np.float32)],
                     j % 10))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = tmp_path / "planted"
    out.mkdir()
    # single file named exactly embeddings.parquet, as the loaders expect
    df.coalesce(1).write.parquet(str(out / "_tmp"))
    import glob, shutil
    part = glob.glob(str(out / "_tmp" / "part-*.parquet"))[0]
    shutil.copy(part, str(out / "embeddings.parquet"))
    return str(out)


def test_embedding_near_dups_detected(spark, tmp_path):
    d = _planted_dir(tmp_path, spark)
    q = all_queries()["embedding_near_dup_pairs"]
    rows = q.fn(spark, d).collect()
    got = {(r.v1, r.v2) for r in rows}
    assert got == {(j, 100 + j) for j in range(5)}
    assert all(r.sim > 0.99 for r in rows)
    # and the DuckDB oracle agrees bit-for-bit on the same file
    run_compare(spark, q, d)


def test_lsh_edges_equal_exact_jaccard_edges(spark, sf_smoke, sf_correct):
    """dedup_clusters consumes minhash_lsh_pairs as its edge input while its
    oracle computes components over exact-Jaccard edges — sound only if the
    LSH+verify edge set equals the exact all-pairs edge set at the same
    threshold (i.e. no true pair escapes every band). Assert that on both
    fixture corpora."""
    qs = all_queries()
    for sf in (sf_smoke, sf_correct):
        exact = {(r.d1, r.d2) for r in
                 qs["ngram_jaccard_pairs"].fn(spark, sf).collect()}
        lsh = {(r.d1, r.d2) for r in
               qs["minhash_lsh_pairs"].fn(spark, sf).collect()}
        assert lsh == exact, (
            f"{sf}: LSH missed {exact - lsh}, extra {lsh - exact}")


def _boilerplate_corpus(tmp_path, spark):
    """100 docs sharing a 30-token boilerplate header (trigram doc-freq 105,
    far above the 64 cap) + unique random tails, plus 5 planted near-dup
    clones differing from their originals by one tail token."""
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(500)]
    boiler = " ".join(f"b{i}" for i in range(30))
    rows = []
    for i in range(100):
        tail = " ".join(rng.choice(words) for _ in range(40))
        rows.append((i, f"{boiler} {tail}", "en", f"src{i % 5}", 0))
    for j in range(5):
        toks = rows[j][1].split(" ")
        toks[-1] = "zzclone"
        rows.append((100 + j, " ".join(toks), "en", f"src{j % 5}", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = tmp_path / "boiler"
    out.mkdir()
    df.coalesce(1).write.parquet(str(out / "_tmp"))
    import glob
    import shutil
    part = glob.glob(str(out / "_tmp" / "part-*.parquet"))[0]
    shutil.copy(part, str(out / "documents.parquet"))
    return str(out)


def test_dfcap_recall_unchanged_on_planted_corpus(spark, tmp_path):
    """The df-capped LSH path must find the same near-dup pair set as the
    uncapped path on a corpus where hot (boilerplate) shingles exceed the
    cap — the hardening drops the hot keys, not the recall."""
    d = _boilerplate_corpus(tmp_path, spark)
    qs = all_queries()
    want = {(j, 100 + j) for j in range(5)}
    uncapped = {(r.d1, r.d2) for r in qs["minhash_lsh_pairs"].fn(spark, d).collect()}
    capped_q = qs["minhash_lsh_pairs_dfcap"]
    capped = {(r.d1, r.d2) for r in capped_q.fn(spark, d).collect()}
    assert uncapped == want
    assert capped == want
    # and the DuckDB oracle agrees on the same planted file
    run_compare(spark, capped_q, d)


def test_dfcap_equals_uncapped_on_fixtures(spark, sf_smoke, sf_correct):
    """On the driver corpora the capped and uncapped pair sets are identical
    (no fixture shingle exceeds the cap pathologically enough to matter)."""
    qs = all_queries()
    for d in (sf_smoke, sf_correct):
        a = sorted(map(tuple, qs["minhash_lsh_pairs"].fn(spark, d).collect()))
        b = sorted(map(tuple, qs["minhash_lsh_pairs_dfcap"].fn(spark, d).collect()))
        assert a == b
