"""Reusable column-expression helpers.

Cross-engine float determinism: double SUM/AVG results depend on partition
order, so Spark and DuckDB can disagree in the last ulp — enough to flip a
ROUND(x, 2). All money-ish aggregates therefore sum in DECIMAL (exact,
order-independent) and cast the decimal straight to double: when the unscaled
value fits in 2^53 (true for every fixture aggregate at sf<=0.1), that cast is
the correctly-rounded value in both engines, hence bit-equal.

Rounding policy (engines disagree on exact-decimal midpoints: Spark rounds
half-up, DuckDB half-down in decimal casts): never ROUND a value that is an
exact decimal with scale > target (e.g. a 4-dp product sum); only round (a)
already-2dp values (identity) or (b) true quotients, whose doubles land on a
midpoint with probability ~0.

This stays entirely JVM-side (whole-stage codegen on decimal ops) — it is a
precision discipline, not a UDF slow path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Default decimal type for 2-dp money columns; wide enough for sf100+ sums.
DEC = "decimal(18,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Exact SUM of a 2-dp double column, returned as double."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def dsum_sql(col: str, alias: str) -> str:
    return f"cast(sum(cast({col} as {DEC})) as double) as {alias}"


def davg(col: Column | str, alias: str) -> Column:
    """AVG via exact decimal sum / count, rounded to 2 dp (identical double
    division in both engines -> bit-equal; quotient, so rounding is safe)."""
    return F.round(
        F.sum(_c(col).cast(DEC)).cast("double") / F.count(_c(col)), 2
    ).alias(alias)


def davg_sql(col: str, alias: str) -> str:
    return (f"round(cast(sum(cast({col} as {DEC})) as double)"
            f" / count({col}), 2) as {alias}")


def dmul_sum(factors: list[Column | str], alias: str) -> Column:
    """Exact SUM of a product of 2-dp factors (e.g. extendedprice*(1-discount)).

    Each factor is cast to decimal(12,2) before multiplying so the product
    stays exact and inside both engines' 38-digit cap for up to 3 factors.
    Output is the unrounded double of the exact decimal sum.
    """
    prod = _c(factors[0]).cast("decimal(12,2)")
    for c in factors[1:]:
        prod = prod * _c(c).cast("decimal(12,2)")
    return F.sum(prod).cast("double").alias(alias)


def dmul_sum_sql(factors: list[str], alias: str) -> str:
    prod = " * ".join(f"cast({f} as decimal(12,2))" for f in factors)
    return f"cast(sum({prod}) as double) as {alias}"


def iso_ts(col: Column | str, alias: str) -> Column:
    """Microsecond ISO-8601 string — matches DuckDB strftime('%Y-%m-%dT%H:%M:%S.%f')."""
    return F.date_format(_c(col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(alias)


def iso_ts_sql(col: str, alias: str) -> str:
    return f"strftime({col}, '%Y-%m-%dT%H:%M:%S.%f') as {alias}"


def cosine_dot_decimal(a: str, b: str) -> Column:
    """Order-deterministic dot product of two float arrays.

    Products of float32 pairs are exact in double (24+24 bits < 53); each is
    cast to decimal(30,12) and summed exactly, so Spark and the DuckDB oracle
    agree regardless of fold/aggregation order. JVM-side (zip_with+aggregate
    inside codegen) — the fast non-oracle path can use a plain double fold.
    """
    # Products are O(1) for unit-ish embeddings: decimal(20,12) holds them
    # with 8 integer digits to spare; the accumulator cast keeps Spark's
    # decimal-widening rules from changing the fold type (scale never drops,
    # so the arithmetic stays exact).
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"cast(cast(x as double) * cast(y as double) as decimal(20,12))), "
        f"cast(0 as decimal(25,12)), "
        f"(acc, v) -> cast(acc + v as decimal(25,12)))"
    )
