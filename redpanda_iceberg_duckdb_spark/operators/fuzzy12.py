"""Blocked fuzzy matching (entity resolution's core join): candidate part
names within edit distance of each other, found by BLOCKING — compare only
within groups sharing a cheap key (here the first name token) — so the
quadratic is per-block, never corpus-wide. Complements the dedup family:
sorted-neighborhood (dedup10b) orders by one key; blocking partitions by
one; both exist so the ER toolbox is complete.

Distinct-first: names collapse to DISTINCT values with multiplicities
before any pairing, so the edit-distance work is bounded by the distinct-
name count per block (64 distinct names across 20K parts at sf0.1 — the
classic low-cardinality-dimension shape), and every matched name pair
carries the part counts it represents. Both engines ship the same
Levenshtein (unit-cost insert/delete/substitute), so distances are exact
integers and the result hash-stable.

Scale stance: one distinct-aggregate keyed by name (map-side combine),
one within-block self-join on the blocking key (per-block quadratic —
blocking keys must be chosen so blocks stay small; AQE skew-join covers a
hot block), one Levenshtein filter. No row-level Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_MAX_DIST = 4

_ORACLE = f"""
WITH d AS (SELECT p_name, split_part(p_name, ' ', 1) AS tok,
                  cast(count(*) AS bigint) AS n_parts
           FROM part GROUP BY 1, 2)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       cast(levenshtein(a.p_name, b.p_name) AS int) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM d a JOIN d b ON a.tok = b.tok AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
ORDER BY edit_dist, name_a, name_b"""


@register(
    "part_name_fuzzy_blocks",
    oracle=_ORACLE,
    tags=("dedup", "entity-resolution", "fuzzy"),
)
def part_name_fuzzy_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs within Levenshtein {_MAX_DIST} sharing a
    first-token block, with the part multiplicities each name carries
    (module docstring has the blocking/distinct-first rationale)."""
    p = load_table(spark, sf_dir, "part")
    d = (p.select("p_name",
                  F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
                   .alias("tok"))
         .groupBy("p_name", "tok")
         .agg(F.count(F.lit(1)).cast("long").alias("n_parts")))
    a = d.select(F.col("p_name").alias("name_a"), "tok",
                 F.col("n_parts").alias("n_parts_a"))
    b = d.select(F.col("p_name").alias("name_b"), "tok",
                 F.col("n_parts").alias("n_parts_b"))
    return (a.join(b, "tok")
            .filter(F.col("name_a") < F.col("name_b"))
            .withColumn("edit_dist",
                        F.levenshtein("name_a", "name_b"))
            .filter(F.col("edit_dist") <= _MAX_DIST)
            .select("name_a", "name_b", "edit_dist",
                    "n_parts_a", "n_parts_b")
            .orderBy("edit_dist", "name_a", "name_b"))
