from __future__ import annotations

import pytest

from redpanda_iceberg_duckdb_spark.operators import multimodal as mm
from redpanda_iceberg_duckdb_spark.registry import all_queries
from redpanda_iceberg_duckdb_spark.tables import load_table

from .oracle_harness import run_compare


def test_multimodal_meta_oracle(spark, sf_smoke):
    run_compare(spark, all_queries()["multimodal_meta"], sf_smoke)


def test_byte_features_pipeline(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    out = mm.extract_byte_features(mm.with_payload(docs))
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    assert set(rows) == set(src)
    some = next(iter(src))
    raw = src[some].encode()
    assert rows[some].n_bytes == len(raw)
    assert rows[some].byte_sum == sum(raw) % 2_147_483_647
    assert rows[some].first_byte == raw[0]
    assert rows[some].frame_offsets == mm.sample_frame_offsets(len(raw))
    assert "payload" not in out.columns  # dropped before any shuffle


def test_decode_stub_gated():
    if not mm.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG")


def test_frame_offsets_edges():
    assert mm.sample_frame_offsets(0) == []
    assert mm.sample_frame_offsets(1, 4) == [0, 0, 0, 0]
    assert mm.sample_frame_offsets(100, 4) == [0, 25, 50, 75]


def test_ppm_decoder_roundtrip_and_grammar():
    # multi-digit dims, multiple comment lines, full raster roundtrip
    raster = bytes(range(108))          # 12 x 3 x 3
    w, h, mx, px = mm.decode_ppm(b"P6\n# c1\n# c2\n12 3\n255\n" + raster)
    assert (w, h, mx) == (12, 3, 255) and px == raster
    # decode_image dispatches P6 to the dependency-free path (the
    # NotImplementedError stub is unreachable for the fixture format)
    assert mm.decode_image(b"P6\n1 1\n255\n" + b"abc") == (1, 1, 255, b"abc")


def test_ppm_decoder_rejects_malformed():
    with pytest.raises(ValueError):            # wrong magic
        mm.decode_ppm(b"P5\n2 2\n255\n" + b"\0" * 12)
    with pytest.raises(ValueError):            # truncated raster
        mm.decode_ppm(b"P6\n2 2\n255\n" + b"\0" * 5)
    with pytest.raises(ValueError):            # 2-byte samples unsupported
        mm.decode_ppm(b"P6\n1 1\n65535\n" + b"\0" * 6)


def test_pixel_stats_oracle(spark, sf_smoke):
    from .oracle_harness import run_compare
    run_compare(spark, all_queries()["multimodal_pixel_stats"], sf_smoke)
