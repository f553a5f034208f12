"""Digest-bit replicate assignment (round-10 verdict item 2).

A B-replicate resampling ensemble (permutation test, block
randomization) needs B pseudo-random fair coins per entity. Hashing
('seed' || b || ':' || entity) costs B md5 evaluations per entity — the
round-10 verdict's measured 99x/64x constant. One md5 digest already
carries 128 independent bits, so replicate b's side assignment can be
BIT b of a single per-entity digest (B <= 128), extracted with an
expression both Spark SQL and DuckDB evaluate identically.

Kept separate from functions/hashing.py on purpose: hashing.py is a
fingerprint dependency of ~70 driver-green queries, and appending here
instead keeps their verification evidence valid (see verification.py).
"""

from __future__ import annotations


def md5_bit_sql(digest: str, bit: str) -> str:
    """Engine-neutral SQL: bit ``bit`` (0..127, LSB-first within each hex
    nibble) of an md5 hex-digest column/expression ``digest``.

    Uses only instr/substr/floor/pow/% so the exact same text evaluates
    identically in Spark SQL and DuckDB; md5 bits are independent fair
    coins across entities and bit positions.
    """
    nib = (f"(instr('0123456789abcdef', substr({digest}, "
           f"cast(1 + floor(({bit}) / 4) as int), 1)) - 1)")
    return f"(cast(floor({nib} / pow(2, ({bit}) % 4)) as int) % 2)"
