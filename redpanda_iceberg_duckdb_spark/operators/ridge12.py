"""Ridge regression (L2-penalized least squares) solved EXACTLY by
Cramer's rule on integer moments — price ~ quantity + discount over
lineitem with penalty lambda on the slope terms (intercept unpenalized,
the standard convention). Extends the one-pass OLS (metrics12.py) to the
multivariate + regularized case while keeping the same scale shape: ONE
combinable aggregate produces the 9 exact integer moments; the 3x3
normal-equation solve is then closed-form arithmetic on that single row
— no iteration, no driver-side linear algebra, no float accumulation.

Every determinant is a polynomial in exact decimal(38,0)/hugeint
integers (identical expression strings in both engines); each
coefficient is ONE division of two exact integers, rounded once.
Magnitude ceiling, stated honestly: triple products reach ~1e31 at
sf0.1 and grow with row count cubed — beyond ~1e9 rows the 38-digit
lattice overflows, and the right design is the same 9 moments collected
as ONE bounded row and solved in arbitrary precision driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_LAMBDA = 100000   # penalty on the integer lattice

# Normal equations: A beta = b with
#   A = [[n, sq, sd], [sq, sqq+L, sqd], [sd, sqd, sdd+L]],  b = [sy, sqy, sdy]
_BASE = dict(r1c1="n", r1c2="sq", r1c3="sd",
             r2c1="sq", r2c2=f"sqq + {_LAMBDA}", r2c3="sqd",
             r3c1="sd", r3c2="sqd", r3c3=f"sdd + {_LAMBDA}")


def _det(repl: dict[str, str]) -> str:
    m = dict(_BASE)
    m.update(repl)
    return ("(({r1c1}) * (({r2c2}) * ({r3c3}) - ({r2c3}) * ({r3c2}))"
            " - ({r1c2}) * (({r2c1}) * ({r3c3}) - ({r2c3}) * ({r3c1}))"
            " + ({r1c3}) * (({r2c1}) * ({r3c2}) - ({r2c2}) * ({r3c1})))"
            ).format(**m)


_DEN = _det({})
# Cramer numerators: replace column j of A with b.
_NUM = {
    "beta_intercept": _det({"r1c1": "sy", "r2c1": "sqy", "r3c1": "sdy"}),
    "beta_quantity": _det({"r1c2": "sy", "r2c2": "sqy", "r3c2": "sdy"}),
    "beta_discount": _det({"r1c3": "sy", "r2c3": "sqy", "r3c3": "sdy"}),
}
# Shared output arithmetic (cents lattice -> dollars via /100), identical
# expression strings in both engines.
_OUT = [f"round(cast({num} AS double) / cast({_DEN} AS double) / 100, 6)"
        f" AS {name}" for name, num in _NUM.items()]

_RIDGE_ORACLE = f"""
WITH pts AS (SELECT cast(l_quantity AS bigint) AS q,
                    cast(round(l_discount * 100) AS bigint) AS d,
                    cast(round(l_extendedprice * 100) AS bigint) AS y
             FROM lineitem),
m AS (SELECT cast(count(*) AS hugeint) AS n,
             cast(sum(q) AS hugeint) AS sq, cast(sum(d) AS hugeint) AS sd,
             cast(sum(cast(q AS hugeint) * q) AS hugeint) AS sqq,
             cast(sum(cast(q AS hugeint) * d) AS hugeint) AS sqd,
             cast(sum(cast(d AS hugeint) * d) AS hugeint) AS sdd,
             cast(sum(y) AS hugeint) AS sy,
             cast(sum(cast(q AS hugeint) * y) AS hugeint) AS sqy,
             cast(sum(cast(d AS hugeint) * y) AS hugeint) AS sdy
      FROM pts)
SELECT cast(n AS bigint) AS n_rows, {_LAMBDA} AS ridge_lambda,
       {', '.join(_OUT)}
FROM m"""


@register(
    "ridge_price_model",
    oracle=_RIDGE_ORACLE,
    tags=("statistics", "regression", "scale-pattern"),
)
def ridge_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge coefficients for price ~ quantity + discount via the exact
    Cramer solve of the penalized normal equations on one moment row
    (module docstring)."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"))
    m = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("q").cast(dec).alias("sq"),
        F.sum("d").cast(dec).alias("sd"),
        F.sum(F.col("q").cast(dec) * F.col("q")).alias("sqq"),
        F.sum(F.col("q").cast(dec) * F.col("d")).alias("sqd"),
        F.sum(F.col("d").cast(dec) * F.col("d")).alias("sdd"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("q").cast(dec) * F.col("y")).alias("sqy"),
        F.sum(F.col("d").cast(dec) * F.col("y")).alias("sdy"))
    return m.selectExpr(
        "cast(n as bigint) AS n_rows",
        f"{_LAMBDA} AS ridge_lambda",
        *_OUT)
