"""Hill estimator of the right-tail index (Hill 1975): how heavy is the
tail of the order-value distribution? alpha = 1 / mean(ln(x_(i) / x_(k)))
over the top-k order statistics — the standard answer to "is this
power-law-ish and with what exponent", the quantitative sibling of the
Zipf slope fit (zipf_fit_by_source) and the Pareto-front family.

Exactness: the top-k cut ranks on the exact cents lattice (TakeOrdered,
never a global sort); each ln(value_cents) is snapped ONCE to micro-nats
(the text11 discipline), so the Hill sum is an exact integer sum of
differences and the estimator one final division.

Scale: top-k per tail is the ONLY data-dependent step — k = 200 rows to
the aggregate, whatever the corpus size. Everything else is constant
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_K = 200   # tail size; the estimator conditions on the k-th order statistic

_HILL_ORACLE = f"""
WITH v AS (SELECT cast(round(o_totalprice * 100) AS bigint) AS x
           FROM orders ORDER BY x DESC LIMIT {_K}),
l AS (SELECT x, cast(round(ln(cast(x AS double)) * 1e6) AS bigint) AS lx
      FROM v),
kth AS (SELECT min(lx) AS lk, min(x) AS xk FROM l)
SELECT cast(count(*) AS bigint) AS k_tail,
       (SELECT cast(xk AS bigint) FROM kth) AS cutoff_cents,
       cast(sum(l.lx - (SELECT lk FROM kth)) AS bigint) AS hill_sum_micronat,
       round(cast(count(*) AS double)
             / nullif(sum(l.lx - (SELECT lk FROM kth)), 0) * 1e6, 6)
         AS tail_index_alpha
FROM l"""


@register(
    "hill_tail_index",
    oracle=_HILL_ORACLE,
    tags=("statistics", "tail", "estimator"),
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index alpha over the top-{_K} order totals (micro-nat
    lattice, TakeOrdered cut — module docstring). NOTE the conventional
    estimator divides by k-1 or k depending on the text; this uses k with
    the k-th order statistic as the cutoff, stated so the oracle and any
    reader agree on the variant."""
    o = load_table(spark, sf_dir, "orders")
    v = (o.select(F.round(F.col("o_totalprice") * 100).cast("long")
                  .alias("x"))
         .orderBy(F.col("x").desc()).limit(_K))
    l_ = v.select("x", F.round(F.log(F.col("x").cast("double")) * 1e6)
                  .cast("long").alias("lx"))
    kth = l_.agg(F.min("lx").alias("lk"), F.min("x").alias("xk"))
    return (l_.crossJoin(F.broadcast(kth))
            .agg(F.count(F.lit(1)).cast("long").alias("k_tail"),
                 F.first("xk").alias("cutoff_cents"),
                 F.sum(F.col("lx") - F.col("lk")).cast("long")
                  .alias("hill_sum_micronat"),
                 F.round(F.count(F.lit(1)).cast("double")
                         / F.nullif(F.sum(F.col("lx") - F.col("lk")),
                                    F.lit(0)) * 1e6, 6)
                  .alias("tail_index_alpha")))
