"""Temperature-scaled source mixing (alpha-sampling) with exact integer
apportionment — the multilingual/multi-source rebalancing rule of
XLM/mT5-style pretraining (Conneau & Lample NeurIPS 2019 sec 3.1; Xue et
al. NAACL 2021 sec 3.2): sample source i proportionally to n_i^alpha with
alpha < 1 so head sources shrink and tail sources grow. Here alpha = 1/2.

Exactness discipline: n_i^(1/2) is computed as the INTEGER square root of
n_i * 10^4 (two fixed decimal digits of precision on sqrt(n_i)) — one
double sqrt seeds the value and a single +-1 integer fixup makes it the
exact floor (a correctly-rounded double sqrt of an int < 2^53 is off by
at most one after floor), so both engines hold identical bigint weights
with no libm-rounding hazard. The 100k-slot budget then apportions by
exact largest remainder on those integer weights — floor(B*w_i/W) plus
one extra slot for the (B*w_i mod W)-largest remainders, ties to the
smaller source name (the sampling10b Neyman shape). Sum of allocations
== B by construction.

Plan: ONE corpus scan (per-source token counts, combinable), then
everything lives on an m-row frame (m = #sources): broadcast total, one
m-row window for remainder ranks. At 100 TB the only data-sized cost is
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_B = 100_000          # mixture budget (slots)
_S2 = 10_000          # weight = isqrt(n_tokens * _S2): 2 decimals on sqrt


def _isqrt_sql(x: str) -> str:
    """Exact integer sqrt of a bigint expression (< 2^53): double-sqrt
    seed + one-step fixup, portable across Spark and DuckDB."""
    w0 = f"cast(floor(sqrt(cast({x} AS double))) AS bigint)"
    return (f"({w0} + (CASE WHEN ({w0} + 1) * ({w0} + 1) <= {x} "
            f"THEN 1 ELSE 0 END) "
            f"- (CASE WHEN {w0} * {w0} > {x} THEN 1 ELSE 0 END))")


def _oracle() -> str:
    w = _isqrt_sql(f"(n_tok * {_S2})")
    return f"""
WITH d AS (
  SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents),
s AS (SELECT source, cast(sum(n_tok) AS bigint) AS n_tok FROM d GROUP BY 1),
wt AS (SELECT source, n_tok, {w} AS w FROM s),
tt AS (SELECT sum(w) AS big_w, sum(n_tok) AS big_n FROM wt),
fl AS (
  SELECT wt.source, wt.n_tok, wt.w, tt.big_w, tt.big_n,
         ({_B} * wt.w) // tt.big_w AS base,
         ({_B} * wt.w) % tt.big_w AS rem
  FROM wt, tt),
rk AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rr,
         {_B} - sum(base) OVER () AS leftover
  FROM fl)
SELECT source, n_tok,
       round(n_tok * 1.0 / big_n, 6) AS natural_share,
       cast(w AS bigint) AS weight,
       cast(base + (CASE WHEN rr <= leftover THEN 1 ELSE 0 END) AS bigint)
           AS alloc
FROM rk ORDER BY source"""


@register(
    "temperature_mixture_allocation",
    oracle=_oracle(),
    tags=("curation", "mixture", "scale-pattern"),
)
def temperature_mixture_allocation(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """(source, n_tok, natural_share, weight, alloc): alpha = 1/2
    temperature-sampled mixture allocation of a 100k-slot budget across
    document sources — exact isqrt weights + exact largest-remainder
    apportionment (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    s = (d.select("source",
                  F.size(F.split(F.col("text"), " ")).alias("n_tok"))
         .groupBy("source")
         .agg(F.sum("n_tok").cast("long").alias("n_tok")))
    wt = s.withColumn("w", F.expr(_isqrt_sql(f"(n_tok * {_S2})")))
    tt = wt.agg(F.sum("w").alias("big_w"), F.sum("n_tok").alias("big_n"))
    fl = (wt.crossJoin(F.broadcast(tt))
          .withColumn("base", F.expr(f"({_B} * w) div big_w"))
          .withColumn("rem", F.expr(f"({_B} * w) % big_w")))
    wr = W.orderBy(F.desc("rem"), F.asc("source"))   # m sources only
    rk = (fl.withColumn("rr", F.row_number().over(wr))
          .withColumn("leftover",
                      F.lit(_B) - F.sum("base").over(
                          W.rowsBetween(W.unboundedPreceding,
                                        W.unboundedFollowing))))
    return (rk.select(
        "source", "n_tok",
        F.round(F.col("n_tok") * 1.0 / F.col("big_n"), 6)
        .alias("natural_share"),
        F.col("w").cast("long").alias("weight"),
        (F.col("base")
         + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0))
        .cast("long").alias("alloc"))
        .orderBy("source"))
