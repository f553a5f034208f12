"""Cross-engine deterministic hashing.

The scale path for sketching (MinHash/SimHash) needs a 64-bit string hash that
both Spark and the DuckDB oracle compute identically, with no global
coordination (no dictionary build, no dense_rank over a single partition).

DuckDB exposes ``md5_number_lower(s)`` = little-endian uint64 of the last 8
bytes of the MD5 digest. Spark has no direct equivalent, but
``conv(byte-swapped hex tail, 16, 10)`` reproduces it exactly:

    md5('abc') hex tail (chars 17..32) = d6963f7d28e17f72
    little-endian  -> 727fe1287d3f96d6 -> 8250560606382298838
    == duckdb md5_number_lower('abc')

Production note: for pure-Spark (non-oracle) pipelines, ``F.xxhash64`` is the
cheaper choice; these md5-based hashes exist so correctness can be proven
against an independent engine with bit-identical sketches.
"""

from __future__ import annotations

# 2^31 - 1 (Mersenne prime): keeps a*h+b inside int64 for a,b < 2^31.
MERSENNE_P = 2_147_483_647

# MinHash permutation parameters h_k(x) = (A[k]*x + B[k]) % P — fixed,
# deterministic literals shared by the Spark pipeline and the DuckDB oracle.
MINHASH_K = 16
MINHASH_A = [(1_103_515_245 * (k + 1) * 2 + 1) % MERSENNE_P for k in range(MINHASH_K)]
MINHASH_B = [(12_345 + 1_000_003 * k) % MERSENNE_P for k in range(MINHASH_K)]


def md5_u64_spark(expr: str) -> str:
    """Spark SQL expression: uint64 (as decimal(20,0)) little-endian of the
    last 8 md5 bytes of ``expr`` — equals DuckDB md5_number_lower(expr)."""
    pairs = ", ".join(f"substr(md5({expr}), {i}, 2)" for i in range(31, 15, -2))
    return f"cast(conv(concat({pairs}), 16, 10) as decimal(20,0))"


def md5_u64_duck(expr: str) -> str:
    return f"md5_number_lower({expr})"


def md5_mod_spark(expr: str, mod: int = MERSENNE_P) -> str:
    """uint64 hash reduced mod ``mod`` as bigint (Spark SQL)."""
    return f"cast({md5_u64_spark(expr)} % {mod} as bigint)"


def md5_mod_duck(expr: str, mod: int = MERSENNE_P) -> str:
    return f"cast({md5_u64_duck(expr)} % {mod} as bigint)"
