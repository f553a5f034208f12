"""Rich-club coefficient (Zhou & Mondragon 2004) of the part co-purchase
graph: phi(k) = the density of the subgraph induced by nodes of degree
> k — do the hubs trade with each other (phi -> 1, the "rich club") or
avoid each other? Completes the graph-structure fingerprint trio next to
degree assortativity (global mixing correlation) and clustering
coefficients (local closure): three different answers to "who connects
to whom".

Exactness: phi(k) = 2 * E_k / (N_k * (N_k - 1)) where E_k (club-internal
edge count) and N_k (club size) are exact integers; one float division
per k, rounded once.

Scale stance: edges and degrees come from the SHARED checkpointed
co-purchase edge cache (graph12.copurchase_oriented_edges — the same
graph, built once per dataset and reused by the triangle/clustering
family), so this query never re-runs the per-order self-join; the club
membership test is ONE broadcast join of the O(V) degree table onto the
src endpoint — the cache orients every edge from the lower (degree, id)
endpoint, so deg(src) IS min(deg_a, deg_b) and the both-endpoints test
``min > k`` needs only the src side; all thresholds are evaluated in
ONE pass via a conditional-sum aggregate per k (no per-k subgraph scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .graph12 import copurchase_oriented_edges

_KS = (4, 8, 16, 32, 64)

_RC_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT x.p AS a, y.p AS b
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
deg AS (SELECT node, cast(count(*) AS bigint) AS d
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node),
ed AS (SELECT da.d AS dda, db.d AS ddb
       FROM e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b),
ks AS (SELECT unnest([{', '.join(str(k) for k in _KS)}]) AS k)
SELECT ks.k,
       (SELECT cast(count(*) AS bigint) FROM deg WHERE d > ks.k) AS club_size,
       (SELECT cast(count(*) AS bigint) FROM ed
        WHERE dda > ks.k AND ddb > ks.k) AS club_edges,
       CASE WHEN (SELECT count(*) FROM deg WHERE d > ks.k) >= 2
            THEN round(2.0 * (SELECT count(*) FROM ed
                              WHERE dda > ks.k AND ddb > ks.k)
                 / ((SELECT count(*) FROM deg WHERE d > ks.k)
                    * ((SELECT count(*) FROM deg WHERE d > ks.k) - 1)), 6)
            ELSE NULL END AS phi
FROM ks ORDER BY ks.k"""


@register(
    "rich_club_coefficient",
    oracle=_RC_ORACLE,
    tags=("graph", "structure"),
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phi(k) for k in {_KS} over the part co-purchase graph — club size,
    club-internal edge count, and density per threshold, all thresholds
    from ONE conditional-aggregate pass over the degree-annotated edge
    list (module docstring). Edges/degrees come from the shared
    checkpointed cache: zero per-call self-join, and deg(src) is the
    edge's MIN endpoint degree by the cache's (degree, id) orientation,
    so the club test needs one broadcast join instead of two."""
    eo, deg, _ = copurchase_oriented_edges(spark, sf_dir)
    ds = F.broadcast(deg.select(F.col("node").alias("src"),
                                F.col("d").alias("sd")))
    ed = eo.join(ds, "src")
    # one pass over edges for every threshold's internal-edge count:
    # both endpoints' degrees > k  <=>  min(deg) = deg(src) > k
    edge_aggs = ed.agg(*[
        F.sum(F.when(F.col("sd") > k, 1)
              .otherwise(0)).cast("long").alias(f"e{k}") for k in _KS])
    size_aggs = deg.agg(*[
        F.sum(F.when(F.col("d") > k, 1).otherwise(0)).cast("long")
        .alias(f"n{k}") for k in _KS])
    one = edge_aggs.crossJoin(F.broadcast(size_aggs))
    stack = ", ".join(
        f"{k}, n{k}, e{k}, CASE WHEN n{k} >= 2 THEN "
        f"round(2.0 * e{k} / (n{k} * (n{k} - 1)), 6) ELSE NULL END"
        for k in _KS)
    return (one.selectExpr(
        f"stack({len(_KS)}, {stack}) AS (k, club_size, club_edges, phi)")
        .orderBy("k"))
