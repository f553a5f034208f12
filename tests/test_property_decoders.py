"""Property tests for the multimodal byte decoders: fixture -> decode is a
ROUND TRIP for arbitrary payload bytes (no Spark needed — these are the
pure functions the mapInPandas paths call per row), and the decoders
enforce their container grammar on mutated headers."""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from redpanda_iceberg_duckdb_spark.operators.multimodal import (
    decode_ppm, ppm_fixture)
from redpanda_iceberg_duckdb_spark.operators.multimodal13 import (
    _DATA_BYTES, _N_SAMP, _SR, decode_wav, wav_fixture)

payloads = st.binary(min_size=0, max_size=400)


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_wav_fixture_roundtrip(data):
    rate, n, raw = decode_wav(wav_fixture(data))
    assert (rate, n) == (_SR, _N_SAMP)
    assert raw == data[:_DATA_BYTES].ljust(_DATA_BYTES, b"\x00")


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_ppm_fixture_roundtrip(data):
    w, h, mx, px = decode_ppm(ppm_fixture(data))
    assert (w, h, mx) == (8, 4, 255)
    assert px == data[:96].ljust(96, b"\x00")


@settings(max_examples=100, deadline=None)
@given(payloads, st.integers(min_value=0, max_value=11))
def test_wav_header_mutation_never_misparses(data, flip_pos):
    """Corrupting any of the first 12 header bytes either still parses to
    a VALID result (the byte was free, e.g. inside the RIFF size we clamp)
    or raises ValueError — never a silent wrong decode or a non-ValueError
    crash."""
    wav = bytearray(wav_fixture(data))
    wav[flip_pos] ^= 0xFF
    try:
        rate, n, raw = decode_wav(bytes(wav))
    except ValueError:
        return
    assert rate == _SR and n * 2 == len(raw)


@settings(max_examples=100, deadline=None)
@given(payloads)
def test_wav_zero_crossings_bounds(data):
    """Derived stats honor their structural bounds for every payload."""
    import numpy as np
    _rate, n, raw = decode_wav(wav_fixture(data))
    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    zc = int((s[:-1] * s[1:] < 0).sum())
    assert 0 <= zc <= n - 1
    assert int(np.abs(s).max()) <= 32768


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=1 << 16),
       st.integers(min_value=1, max_value=1 << 16))
def test_half_up_micro_div_matches_decimal(c, n):
    """The integer half-up lattice used by brier_decomposition_hourly:
    (2e6*c + n) div (2n) == round-half-up(1e6 * c / n) computed exactly."""
    from decimal import ROUND_HALF_UP, Decimal
    got = (2_000_000 * c + n) // (2 * n)
    want = int((Decimal(c) * 1_000_000 / Decimal(n))
               .quantize(Decimal(1), rounding=ROUND_HALF_UP))
    assert got == want
