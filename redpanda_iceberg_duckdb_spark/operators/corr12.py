"""Pairwise Pearson correlation MATRIX over lineitem's numeric measures in
ONE combinable aggregate pass — the feature-screening primitive (which
measures are redundant, which anti-correlate) computed the only way that
works at 100 TB: every sum/cross-moment for all k columns and all
k(k-1)/2 pairs accumulates in a single map-side-combinable aggregate
(one scan, one reduce row), then the k^2 matrix is arithmetic on that
one row. Never k^2 scans, never a shuffle per pair.

Exactness (metrics12 OLS discipline): quantity is integral; price,
discount, and tax live on exact cents/hundredths lattices, so every
moment is an exact decimal(38,0)/hugeint integer; each correlation is
(n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)) — two sqrts
and one division on identical integers, rounded once to 6.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# (name, integer-lattice SQL expression) — identical in both engines.
_COLS = [
    ("quantity", "cast(l_quantity as bigint)"),
    ("price", "cast(round(l_extendedprice * 100) as bigint)"),
    ("discount", "cast(round(l_discount * 100) as bigint)"),
    ("tax", "cast(round(l_tax * 100) as bigint)"),
]


def _corr_sql(a: str, b: str) -> str:
    return (f"round(cast(n * s_{a}_{b} - s_{a} * s_{b} as double)"
            f" / (sqrt(cast(n * s_{a}_{a} - s_{a} * s_{a} as double))"
            f" * sqrt(cast(n * s_{b}_{b} - s_{b} * s_{b} as double))), 6)")


def _oracle() -> str:
    proj = ", ".join(f"{e} AS {n}" for n, e in _COLS)
    moments = ["cast(count(*) AS hugeint) AS n"]
    for n, _ in _COLS:
        moments.append(f"cast(sum({n}) AS hugeint) AS s_{n}")
    for (a, _), (b, _) in combinations(_COLS, 2):
        moments.append(
            f"cast(sum(cast({a} AS hugeint) * {b}) AS hugeint) AS s_{a}_{b}")
    for n, _ in _COLS:
        moments.append(
            f"cast(sum(cast({n} AS hugeint) * {n}) AS hugeint) AS s_{n}_{n}")
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, {_corr_sql(a, b)} AS corr "
        f"FROM m"
        for (a, _), (b, _) in combinations(_COLS, 2))
    return (f"WITH pts AS (SELECT {proj} FROM lineitem), "
            f"m AS (SELECT {', '.join(moments)} FROM pts) "
            f"{rows} ORDER BY col_a, col_b")


@register(
    "correlation_matrix_lineitem",
    oracle=_oracle(),
    tags=("statistics", "scale-pattern"),
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 6 pairwise Pearson correlations of lineitem's numeric measures
    from ONE aggregate pass over exact integer moments (module docstring)."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(*[F.expr(e).alias(n) for n, e in _COLS])
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    for n, _ in _COLS:
        aggs.append(F.sum(n).cast(dec).alias(f"s_{n}"))
    for (a, _), (b, _) in combinations(_COLS, 2):
        aggs.append(F.sum(F.col(a).cast(dec) * F.col(b)).alias(f"s_{a}_{b}"))
    for n, _ in _COLS:
        aggs.append(F.sum(F.col(n).cast(dec) * F.col(n)).alias(f"s_{n}_{n}"))
    m = pts.agg(*aggs)
    # Unpivot the single moment row with stack() — ONE projection, so the
    # lineitem scan runs once (a per-pair select would re-execute the
    # aggregate 6 times).
    stack_args = ", ".join(
        f"'{a}', '{b}', {_corr_sql(a, b)}"
        for (a, _), (b, _) in combinations(_COLS, 2))
    return (m.select(F.expr(
        f"stack(6, {stack_args}) AS (col_a, col_b, corr)"))
        .orderBy("col_a", "col_b"))
