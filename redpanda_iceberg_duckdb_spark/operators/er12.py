"""Entity resolution end-to-end: blocked fuzzy matching (fuzzy12) ->
transitive closure (clusters.connected_components) -> one canonical entity
per cluster. This is the step record-linkage pipelines run after pairwise
matching — pair decisions alone are not entities; A~B and B~C must collapse
A,B,C into one identity even when A~C was never compared (its block differs
or its distance exceeds the cutoff).

Node ids: each distinct name is keyed by the MIN p_partkey carrying it — a
deterministic dense surrogate both engines derive with one aggregate, so
the min-label component ids are comparable across engines without any
global dictionary build.

Scale stance: the edge list comes from the blocked (per-block quadratic)
fuzzy join, never an all-pairs compare; components run the same iterative
min-label propagation as dedup_clusters (small-star style, persisted +
checkpointed rounds); the final rollup is one groupBy over O(names) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .clusters import connected_components
from .fuzzy12 import _MAX_DIST

_ER_ORACLE = f"""
WITH d AS (SELECT p_name, split_part(p_name, ' ', 1) AS tok,
                  min(p_partkey) AS nid, cast(count(*) AS bigint) AS np
           FROM part GROUP BY 1, 2),
edges AS (SELECT a.nid AS n1, b.nid AS n2
          FROM d a JOIN d b ON a.tok = b.tok AND a.p_name < b.p_name
          WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}),
und AS (SELECT n1 AS a, n2 AS b FROM edges
        UNION ALL SELECT n2, n1 FROM edges),
comp AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM und
    UNION
    SELECT und.a, walk.comp FROM und JOIN walk ON und.b = walk.node
  )
  SELECT node, min(comp) AS comp FROM walk GROUP BY node)
SELECT c.comp AS component,
       cast(count(*) AS bigint) AS n_names,
       cast(sum(d.np) AS bigint) AS n_parts,
       min(d.p_name) AS rep_name
FROM comp c JOIN d ON d.nid = c.node
GROUP BY 1 ORDER BY 1"""


@register(
    "er_fuzzy_clusters",
    oracle=_ER_ORACLE,
    tags=("entity-resolution", "graph", "dedup"),
)
def er_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters (size >= 2) from the transitive closure of the
    blocked Levenshtein match graph over distinct part names; per cluster
    the name count, total part multiplicity, and lexicographic
    representative name (module docstring)."""
    p = load_table(spark, sf_dir, "part")
    d = (p.select("p_partkey", "p_name",
                  F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
                   .alias("tok"))
         .groupBy("p_name", "tok")
         .agg(F.min("p_partkey").alias("nid"),
              F.count(F.lit(1)).cast("long").alias("np")))
    a = d.select(F.col("p_name").alias("name_a"), "tok",
                 F.col("nid").alias("n1"))
    b = d.select(F.col("p_name").alias("name_b"), "tok",
                 F.col("nid").alias("n2"))
    edges = (a.join(b, "tok")
             .filter(F.col("name_a") < F.col("name_b"))
             .filter(F.levenshtein("name_a", "name_b") <= _MAX_DIST)
             .select("n1", "n2"))
    comp = connected_components(edges, src="n1", dst="n2")
    return (comp.join(d.select(F.col("nid").alias("node"), "p_name", "np"),
                      "node")
            .groupBy(F.col("comp").alias("component"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_names"),
                 F.sum("np").cast("long").alias("n_parts"),
                 F.min("p_name").alias("rep_name"))
            .orderBy("component"))
