"""Entropic optimal transport (Sinkhorn-Knopp) between the label
distributions of the even- and odd-id embedding populations — the
regularized OT companion to the exact 1-D/circular EMD (ot14) and
sliced-Wasserstein readouts: it produces the full transport PLAN, not
just a cost, which is what a rebalancing pipeline actually consumes
("how much src0 mass should retrain as label 7").

Determinism strategy — this is the repo's only fixed-point float
iteration shared with DuckDB, so the usual lattice trick does not apply
(the scaling vectors are irrational ratios). Instead BOTH engines run
the LITERALLY IDENTICAL expression tree, machine-generated from one
template: the Gibbs kernel K = round(1e6 * exp(-(i-j)^2 / eps)) is
precomputed in PYTHON and inlined as integer literals (zero libm in
either engine), the label masses are exact count ratios, and each of
the 10 Sinkhorn rounds is an explicit 10-term left-associated
sum — IEEE double arithmetic is deterministic given identical
operations, so the engines cannot diverge. (K's scale cancels: scaling
K multiplies u by 1/s and leaves the plan invariant.)

Scale stance (100 TB): the corpus is reduced by ONE map-side-combinable
conditional aggregation to a 1-row, 20-column mass frame; the iteration
is constant-size (label-grid) algebra that Catalyst constant-folds into
a single projection — no per-row work, no loop jobs, no collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load_table

_L = 10          # labels 0..9
_EPS = 10.0      # entropic regularization on the (i-j)^2 cost
_ROUNDS = 10

# Gibbs kernel on the 1e6 lattice, computed once in Python and inlined
# as integer literals in BOTH engines' SQL.
_K = [[round(1_000_000 * math.exp(-((i - j) ** 2) / _EPS))
       for j in range(_L)] for i in range(_L)]


def _iteration_sql() -> str:
    """Chained CTEs it1..it{_ROUNDS} over a 1-row CTE `mass` with columns
    a0..a9, b0..b9: each round updates u then v with explicit 10-term
    sums (left-associated, identical text in both engines)."""
    parts = []
    prev_v = ["1.0"] * _L                      # v_j start (round-0 names)
    prev = "mass"
    for t in range(1, _ROUNDS + 1):
        u_terms = []
        for i in range(_L):
            den = " + ".join(f"{_K[i][j]} * {prev_v[j]}"
                             for j in range(_L))
            u_terms.append(f"a{i} / ({den}) AS u{i}_{t}")
        parts.append(f"itu{t} AS MATERIALIZED (SELECT *, "
                     f"{', '.join(u_terms)} FROM {prev})")
        v_terms = []
        for j in range(_L):
            den = " + ".join(f"{_K[i][j]} * u{i}_{t}" for i in range(_L))
            v_terms.append(f"b{j} / ({den}) AS v{j}_{t}")
        parts.append(f"itv{t} AS MATERIALIZED (SELECT *, "
                     f"{', '.join(v_terms)} FROM itu{t})")
        prev = f"itv{t}"
        prev_v = [f"v{j}_{t}" for j in range(_L)]
    return ",\n".join(parts)


def _plan_sql() -> str:
    rows = []
    for i in range(_L):
        for j in range(_L):
            rows.append(
                f"SELECT {i} AS i, {j} AS j, "
                f"round(u{i}_{_ROUNDS} * {_K[i][j]} * v{j}_{_ROUNDS}, 8)"
                f" AS p FROM itv{_ROUNDS}")
    return "\nUNION ALL ".join(rows)


def _mass_cols() -> str:
    cols = []
    for i in range(_L):
        cols.append(
            f"cast(sum(CASE WHEN label = {i} AND vec_id % 2 = 0 "
            f"THEN 1 ELSE 0 END) AS double) / "
            f"cast(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) "
            f"AS double) AS a{i}")
    for j in range(_L):
        cols.append(
            f"cast(sum(CASE WHEN label = {j} AND vec_id % 2 = 1 "
            f"THEN 1 ELSE 0 END) AS double) / "
            f"cast(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) "
            f"AS double) AS b{j}")
    return ", ".join(cols)


_SINKHORN_ORACLE = f"""
WITH mass AS (SELECT {_mass_cols()} FROM embeddings),
{_iteration_sql()}
SELECT i, j, p FROM ({_plan_sql()}) ORDER BY i, j"""


@register(
    "sinkhorn_plan_labels",
    oracle=_SINKHORN_ORACLE,
    tags=("optimal-transport", "embedding", "iterative"),
)
def sinkhorn_plan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, p): the 10-round Sinkhorn transport plan between even-id
    and odd-id label masses under the inlined integer Gibbs kernel
    (module docstring). The per-round expressions are the same generated
    text the oracle runs; Spark materializes the 1-row frame after each
    round (localCheckpoint) because Catalyst's CollapseProject would
    otherwise SUBSTITUTE every round into the next — a 10^k expression
    tree that took minutes to analyze (DuckDB evaluates chained CTEs
    row-wise and never textually expands them). 21 sub-second 1-row
    jobs instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("sinkhorn15_emb")
    cur = (spark.sql(f"SELECT {_mass_cols()} FROM sinkhorn15_emb")
           .localCheckpoint(eager=True))
    prev_v = ["1.0"] * _L
    for t in range(1, _ROUNDS + 1):
        u_exprs = []
        for i in range(_L):
            den = " + ".join(f"{_K[i][j]} * {prev_v[j]}"
                             for j in range(_L))
            u_exprs.append(f"a{i} / ({den}) AS u{i}_{t}")
        cur = cur.selectExpr("*", *u_exprs)
        v_exprs = []
        for j in range(_L):
            den = " + ".join(f"{_K[i][j]} * u{i}_{t}" for i in range(_L))
            v_exprs.append(f"b{j} / ({den}) AS v{j}_{t}")
        cur = (cur.selectExpr("*", *v_exprs)
               .localCheckpoint(eager=True))
        prev_v = [f"v{j}_{t}" for j in range(_L)]
    stack_args = ", ".join(
        f"{i}, {j}, round(u{i}_{_ROUNDS} * {_K[i][j]} * v{j}_{_ROUNDS}, 8)"
        for i in range(_L) for j in range(_L))
    return (cur.selectExpr(f"stack({_L * _L}, {stack_args}) "
                           "AS (i, j, p)")
            .orderBy("i", "j"))
