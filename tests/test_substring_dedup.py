"""Planted-span recall for the exact-substring dedup family
(substring_dedup.py): build a documents.parquet where two documents embed a
known verbatim 20-word span (and everything else is unique words), prove the
per-doc span stats and the cut-list recover exactly that span — position,
length, both carriers — and that the DuckDB oracle agrees on the same file.
"""

from __future__ import annotations

from redpanda_iceberg_duckdb_spark.registry import all_queries

from .oracle_harness import run_compare

_SPAN = " ".join(f"plant{i}" for i in range(20))  # 20-word planted span


def _planted_docs_dir(tmp_path, spark):
    # Unique filler words everywhere else: no accidental duplicated
    # 8-shingle can exist outside the plant.
    def filler(doc, n):
        return " ".join(f"u{doc}w{i}" for i in range(n))

    docs = [
        # doc 0: plant at word offset 10
        (0, filler("a", 10) + " " + _SPAN + " " + filler("b", 7)),
        # doc 1: plant at word offset 3
        (1, filler("c", 3) + " " + _SPAN + " " + filler("d", 12)),
        # docs 2/3: no plant
        (2, filler("e", 30)),
        (3, filler("f", 25)),
    ]
    rows = [(i, t, "en", "src0", len(t)) for i, t in docs]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = tmp_path / "planted_docs"
    out.mkdir()
    df.coalesce(1).write.parquet(str(out / "_tmp"))
    import glob
    import shutil
    part = glob.glob(str(out / "_tmp" / "part-*.parquet"))[0]
    shutil.copy(part, str(out / "documents.parquet"))
    return str(out)


def test_planted_span_stats_exact(spark, tmp_path):
    d = _planted_docs_dir(tmp_path, spark)
    q = all_queries()["exact_substring_spans"]
    rows = {r.doc_id: r for r in q.fn(spark, d).collect()}
    # only the two planted carriers report spans
    assert set(rows) == {0, 1}
    for doc in (0, 1):
        assert rows[doc].n_spans == 1
        # a 20-word span == 13 consecutive duplicated 8-shingles -> 20
        assert rows[doc].max_span_tokens == 20
        assert rows[doc].span_token_mass == 20
    run_compare(spark, q, d)


def test_planted_span_cutlist_positions(spark, tmp_path):
    d = _planted_docs_dir(tmp_path, spark)
    q = all_queries()["exact_substring_cutlist"]
    rows = {(r.doc_id): (r.span_start, r.span_tokens)
            for r in q.fn(spark, d).collect()}
    # exact start offsets: doc 0 plants at word 10, doc 1 at word 3
    assert rows == {0: (10, 20), 1: (3, 20)}
    run_compare(spark, q, d)
