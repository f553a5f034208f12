"""Luhn (mod-10) checksum audit — the validator behind every
card-number/IMEI/account-id detector in a PII pipeline, made a
cross-engine-checked operator instead of a regex guess (the existing
pii_redaction_audit finds SHAPES; Luhn proves CHECK-DIGIT validity,
which is what separates a real PAN from 16 random digits).

Fixture discipline (the WAV-replay corruption pattern): every order
deterministically derives a 15-digit base from its md5, appends the
CORRECT Luhn check digit, and orders with o_orderkey % 7 == 0 then get
digit 3 bumped (+1 mod 10). The audit recomputes full-PAN validity from
the digits alone; Luhn detects EVERY single-digit substitution, so the
expected result — intact cohort 100% valid, corrupted cohort 0% — is a
property of the algorithm, emitted and hash-checked as data.

Scale stance (100 TB): pure per-row digit arithmetic (16 substring+mod
expressions, all JVM-native) + one combinable aggregate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_N = 15          # base digits; digit 16 is the check digit


def _dsum(expr: str) -> str:
    """Double-and-digit-sum: f(d) = 2d - 9 if 2d > 9 else 2d."""
    return (f"(CASE WHEN 2 * ({expr}) > 9 THEN 2 * ({expr}) - 9 "
            f"ELSE 2 * ({expr}) END)")


def _digit_duck(i: int) -> str:
    return (f"(cast('0x' || substring(md5(cast(o_orderkey AS varchar)), "
            f"{i}, 1) AS bigint) % 10)")


def _digit_spark(i: int) -> str:
    return (f"(cast(conv(substring(md5(cast(o_orderkey as string)), "
            f"{i}, 1), 16, 10) as bigint) % 10)")


def _pan_sql(digit_fn) -> str:
    """Shared construction: corrupted digit-3, check digit, full-PAN Luhn
    sum. Returns SQL computing (cohort, luhn_total % 10)."""
    # For a 16-digit PAN, odd 1-based positions (from the left) double.
    d = {i: digit_fn(i) for i in range(1, _N + 1)}
    # corruption: digit 3 bumped on the corrupt cohort
    d[3] = (f"(CASE WHEN o_orderkey % 7 = 0 THEN ({d[3]} + 1) % 10 "
            f"ELSE {d[3]} END)")
    s15 = " + ".join(_dsum(d[i]) if i % 2 == 1 else f"({d[i]})"
                     for i in range(1, _N + 1))
    base15 = " + ".join(_dsum(digit_fn(i)) if i % 2 == 1
                        else f"({digit_fn(i)})" for i in range(1, _N + 1))
    check = f"((10 - (({base15}) % 10)) % 10)"    # from the INTACT digits
    return (f"SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'corrupted' "
            f"ELSE 'intact' END AS cohort, "
            f"(({s15}) + ({check})) % 10 AS luhn_mod FROM orders")


_LUHN_ORACLE = f"""
WITH pans AS ({_pan_sql(_digit_duck)})
SELECT cohort, cast(count(*) AS bigint) AS n_cards,
       cast(sum(CASE WHEN luhn_mod = 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_luhn_valid,
       round(sum(CASE WHEN luhn_mod = 0 THEN 1.0 ELSE 0 END) / count(*), 6)
         AS pct_valid
FROM pans GROUP BY cohort ORDER BY cohort"""


@register(
    "luhn_checksum_audit",
    oracle=_LUHN_ORACLE,
    tags=("pii", "data-quality", "scalar"),
)
def luhn_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-PAN Luhn validity per cohort (module docstring): intact
    cohort must be 100% valid, the single-digit-corrupted cohort 0% —
    the mod-10 guarantee as hash-checked data."""
    load_table(spark, sf_dir, "orders")   # registers the temp view
    pans = spark.sql(_pan_sql(_digit_spark))
    valid = F.when(F.col("luhn_mod") == 0, 1).otherwise(0)
    return (pans.groupBy("cohort")
            .agg(F.count(F.lit(1)).alias("n_cards"),
                 F.sum(valid).cast("long").alias("n_luhn_valid"),
                 F.round(F.sum(valid.cast("double")) / F.count(F.lit(1)), 6)
                 .alias("pct_valid"))
            .orderBy("cohort"))
