"""Logistic regression, first Newton-Raphson / IRLS step from beta = 0 —
the GLM building block, honestly labeled as exactly that (NOT a converged
fit). At beta = 0 the sigmoid is 1/2 everywhere, so the Hessian is
-X'X/4 and the gradient is X'(y - 1/2): the first iterate is

    beta_1 = 4 (X'X)^{-1} X'(y - 1/2) = 2 (X'X)^{-1} X'(2y - 1)

— a pure function of the SAME exact integer moment matrix the ridge
solver (ridge12.py) uses, solved by the same 3x3 Cramer determinants.
Every subsequent IRLS step needs per-row sigmoids (snap-to-micro-lattice
territory); the first step needs nothing beyond one combinable aggregate,
which makes it the scale-cheap screening fit: the SIGNS and relative
magnitudes of beta_1 already rank feature relevance (it is proportional
to the score test direction at the null).

Model: purchase-vs-rest over events, features = value (cents lattice)
and hour-of-day. Coefficients are reported in micro units (x 1e6) so
round-6 output stays informative at this feature scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_BASE = dict(r1c1="n", r1c2="s1", r1c3="s2",
             r2c1="s1", r2c2="s11", r2c3="s12",
             r3c1="s2", r3c2="s12", r3c3="s22")


def _det(repl: dict[str, str]) -> str:
    m = dict(_BASE)
    m.update(repl)
    return ("(({r1c1}) * (({r2c2}) * ({r3c3}) - ({r2c3}) * ({r3c2}))"
            " - ({r1c2}) * (({r2c1}) * ({r3c3}) - ({r2c3}) * ({r3c1}))"
            " + ({r1c3}) * (({r2c1}) * ({r3c2}) - ({r2c2}) * ({r3c1})))"
            ).format(**m)


_DEN = _det({})
_NUM = {
    "beta_intercept_micro": _det({"r1c1": "g0", "r2c1": "g1", "r3c1": "g2"}),
    "beta_value_micro": _det({"r1c2": "g0", "r2c2": "g1", "r3c2": "g2"}),
    "beta_hour_micro": _det({"r1c3": "g0", "r2c3": "g1", "r3c3": "g2"}),
}
# beta_1 = 2 A^{-1} g with g = X'(2y-1); micro scaling for readability.
_OUT = [f"round(2e6 * cast({num} AS double) / cast({_DEN} AS double), 6)"
        f" AS {name}" for name, num in _NUM.items()]

_GLM_ORACLE = f"""
WITH pts AS (SELECT 1 AS one,
                    cast(round(value * 100) AS bigint) AS x1,
                    cast(extract(hour FROM ts) AS bigint) AS x2,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS z
             FROM events),
m AS (SELECT cast(count(*) AS hugeint) AS n,
             cast(sum(x1) AS hugeint) AS s1, cast(sum(x2) AS hugeint) AS s2,
             cast(sum(cast(x1 AS hugeint) * x1) AS hugeint) AS s11,
             cast(sum(cast(x1 AS hugeint) * x2) AS hugeint) AS s12,
             cast(sum(cast(x2 AS hugeint) * x2) AS hugeint) AS s22,
             cast(sum(z) AS hugeint) AS g0,
             cast(sum(cast(x1 AS hugeint) * z) AS hugeint) AS g1,
             cast(sum(cast(x2 AS hugeint) * z) AS hugeint) AS g2
      FROM pts)
SELECT cast(n AS bigint) AS n_events,
       cast(g0 AS bigint) AS pos_minus_neg,
       {', '.join(_OUT)}
FROM m"""


@register(
    "logistic_first_newton_step",
    oracle=_GLM_ORACLE,
    tags=("statistics", "regression", "glm", "scale-pattern"),
)
def logistic_first_newton_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First IRLS iterate of purchase ~ value + hour from the null model,
    exact on the integer moment lattice via the shared 3x3 Cramer solve
    (module docstring states precisely what this is and is not)."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x1"),
        F.hour("ts").cast("long").alias("x2"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(-1).alias("z"))
    m = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x1").cast(dec).alias("s1"),
        F.sum("x2").cast(dec).alias("s2"),
        F.sum(F.col("x1").cast(dec) * F.col("x1")).alias("s11"),
        F.sum(F.col("x1").cast(dec) * F.col("x2")).alias("s12"),
        F.sum(F.col("x2").cast(dec) * F.col("x2")).alias("s22"),
        F.sum("z").cast(dec).alias("g0"),
        F.sum(F.col("x1").cast(dec) * F.col("z")).alias("g1"),
        F.sum(F.col("x2").cast(dec) * F.col("z")).alias("g2"))
    return m.selectExpr(
        "cast(n as bigint) AS n_events",
        "cast(g0 as bigint) AS pos_minus_neg",
        *_OUT)
