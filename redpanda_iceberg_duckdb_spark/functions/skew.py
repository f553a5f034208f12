"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one build-side key is so hot
that even split partitions overwhelm a task, or when AQE is unavailable
(streaming joins). Technique: replicate the small side R times, scatter the
big side's hot keys across R salt buckets, join on (key, salt) — same result,
R-way parallelism on the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str, *,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join big⋈small on ``key`` with an R-way salt.

    big gets a uniform salt per row; small is exploded R times (one replica
    per salt value). Correct for inner/left joins on an equi-key; the small
    side must actually be small (it is replicated R times).
    """
    salted_big = big.withColumn(
        "_salt", (F.pmod(F.xxhash64(*[F.col(key), F.monotonically_increasing_id()]),
                         F.lit(salts))).cast("int"))
    replicas = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = salted_big.join(replicas, [key, "_salt"], how)
    return out.drop("_salt")


def hot_key_salt(key_col: Column, hot_keys: list, salts: int) -> Column:
    """Salt expression that scatters only known-hot keys (cold keys keep salt
    0, so the small side needs replicas only for the hot subset). Uses a
    deterministic row-id hash, not rand(), so retried tasks salt
    identically."""
    scatter = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                     F.lit(salts)).cast("int")
    return F.when(key_col.isin(hot_keys), scatter).otherwise(F.lit(0))
