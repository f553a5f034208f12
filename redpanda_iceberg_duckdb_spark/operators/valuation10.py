"""Exact Shapley data valuation over coarse source groups (Ghorbani &
Zou, ICML 2019 scaled down to group granularity, where it is EXACT):
with the corpus hashed into G=3 source groups and the utility of a
subset = mean document length over its docs, every one of the 2^3
subset utilities is a ratio of two group-sum recombinations — so the
whole Shapley computation needs ONE aggregate producing 3 (sum, count)
rows, then 2^G arithmetic. LOO ablation (ablation.py) reports marginal-
vs-full deltas; Shapley averages the marginal over ALL arrival orders,
the principled attribution when sources interact through shared scale.

Determinism: group sums are exact integers; subset utilities are single
divisions; each phi_g is the SAME four-term expression evaluated left to
right on both engines (weights 1/3, 1/6, 1/6, 1/3 as literal divisions).
Efficiency (sum phi_g = v(full)) is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_G = 3


def _phi_sql(g: int) -> str:
    """phi_g as the explicit four-term expression over scalar subqueries
    v(S) — subsets encoded by which group sums participate."""
    o = [x for x in range(_G) if x != g]

    def v(*gs):
        if not gs:
            return "0.0"
        num = " + ".join(f"s{x}" for x in gs)
        den = " + ".join(f"n{x}" for x in gs)
        return f"(cast({num} AS double) / ({den}))"
    return (f"({v(g)} - 0.0) / 3 "
            f"+ ({v(g, o[0])} - {v(o[0])}) / 6 "
            f"+ ({v(g, o[1])} - {v(o[1])}) / 6 "
            f"+ ({v(g, o[0], o[1])} - {v(o[0], o[1])}) / 3")


def _oracle() -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT {g} AS grp, n{g} AS n_docs, "
        f"round({_phi_sql(g)}, 6) AS shapley_value, "
        f"round(cast(s0 + s1 + s2 AS double) / (n0 + n1 + n2), 6) "
        f"AS v_full FROM wide" for g in range(_G))
    return f"""
WITH grouped AS (
  SELECT {md5_mod_duck('source', _G)} AS g,
         cast(sum(n_chars) AS bigint) AS s, count(*) AS n
  FROM documents GROUP BY 1),
wide AS (
  SELECT
    max(CASE WHEN g = 0 THEN s END) AS s0,
    max(CASE WHEN g = 1 THEN s END) AS s1,
    max(CASE WHEN g = 2 THEN s END) AS s2,
    max(CASE WHEN g = 0 THEN n END) AS n0,
    max(CASE WHEN g = 1 THEN n END) AS n1,
    max(CASE WHEN g = 2 THEN n END) AS n2
  FROM grouped)
SELECT cast(grp AS bigint) AS grp, cast(n_docs AS bigint) AS n_docs,
       shapley_value, v_full
FROM ({rows}) ORDER BY grp"""


@register(
    "shapley_source_value",
    oracle=_oracle(),
    tags=("valuation", "curation", "evaluation", "scale-pattern"),
)
def shapley_source_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, n_docs, shapley_value, v_full): exact Shapley attribution of
    the corpus mean-length utility across 3 hashed source groups, from
    one (sum, count)-per-group aggregate (module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    grouped = (docs.groupBy(F.expr(md5_mod_spark("source", _G)).alias("g"))
               .agg(F.sum("n_chars").cast("long").alias("s"),
                    F.count(F.lit(1)).alias("n"))
               .collect())   # G rows
    s = {r["g"]: float(r["s"]) for r in grouped}
    n = {r["g"]: float(r["n"]) for r in grouped}

    def v(*gs):
        if not gs:
            return 0.0
        return sum(s[x] for x in gs) / sum(n[x] for x in gs)

    v_full = round(v(0, 1, 2), 6)
    out = []
    for g in range(_G):
        o = [x for x in range(_G) if x != g]
        phi = ((v(g) - 0.0) / 3
               + (v(g, o[0]) - v(o[0])) / 6
               + (v(g, o[1]) - v(o[1])) / 6
               + (v(g, o[0], o[1]) - v(o[0], o[1])) / 3)
        out.append((g, int(n[g]), round(phi, 6), v_full))
    return (spark.createDataFrame(
                out, "grp bigint, n_docs bigint, shapley_value double, "
                     "v_full double")
            .orderBy("grp"))
