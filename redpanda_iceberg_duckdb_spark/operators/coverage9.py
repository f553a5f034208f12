"""Greedy maximum-coverage data selection — pick the k documents whose
trigram sets together cover the most of the corpus vocabulary (the
classic submodular-maximization greedy, Nemhauser et al. 1978; the shape
behind diversity-driven training-data selection and facility-location
selectors).

Round r: gain(doc) = |trigrams(doc) \\ covered|; take the argmax
(ties by doc_id); add its trigrams to `covered`. The greedy is provably
a (1 - 1/e)-approximation of the optimal k-cover, and — unlike score-
and-sort heuristics — each pick accounts for what earlier picks already
cover.

Scale discipline (the BPE/MMR loop family): the trigram table is built
once (one scan + explode); per round ONE anti-join against the covered
set + one map-side-combinable count + a TakeOrdered(1) argmax + ONE
scalar row to the driver. The covered set is derived by filtering the
trigram table to the <= k selected doc_ids (a broadcast-size id list),
so no accumulating state frame needs checkpointing. k is a constant;
corpus size enters only the per-round anti-join, which is
hash-partitioned on the trigram.

JOB-COUNT CEILING: the greedy is inherently sequential — one Spark job
per pick, k jobs total. That is fine for k <= ~50 (driver round-trips,
not compute, dominate each job); for hundreds of picks use stochastic
greedy (Mirzasoleiman et al. 2015: per round, argmax over a sampled
candidate subset — same (1-1/e)-epsilon bound, constant rounds of
batched picks) rather than scaling this loop.

The oracle unrolls the same k rounds (NOT EXISTS against the union of
prior picks' trigrams), so a green row proves every round's gain counts
and tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from .shingles import _TG_CTE_DUCK, _doc_trigrams

_K = 5


def _oracle() -> str:
    parts = [f"WITH {_TG_CTE_DUCK}"]
    prev_cov = None
    finals = []
    for r in range(1, _K + 1):
        if prev_cov is None:
            gain = f"""
g{r} AS (SELECT doc_id, count(*) AS gain FROM t GROUP BY doc_id)"""
        else:
            gain = f"""
g{r} AS (SELECT a.doc_id, count(*) AS gain
        FROM t a
        WHERE NOT EXISTS (SELECT 1 FROM {prev_cov} c WHERE c.tg = a.tg)
        GROUP BY a.doc_id)"""
        sel = f"""
s{r} AS (SELECT doc_id, gain, {r} AS pos FROM g{r}
        ORDER BY gain DESC, doc_id LIMIT 1)"""
        cov = f"""
cov{r} AS (SELECT DISTINCT tg FROM t
          WHERE doc_id IN ({" UNION ALL ".join(
              f"SELECT doc_id FROM s{i}" for i in range(1, r + 1))}))"""
        parts.extend(["," + gain, "," + sel, "," + cov])
        prev_cov = f"cov{r}"
        finals.append(f"SELECT pos, doc_id, gain FROM s{r}")
    body = "\nUNION ALL\n".join(finals)
    return ("".join(parts)
            + f"""
SELECT cast(pos AS bigint) AS pos, doc_id,
       cast(gain AS bigint) AS new_trigrams
FROM ({body}) ORDER BY pos""")


@register(
    "greedy_coverage_selection",
    oracle=_oracle(),
    tags=("curation", "selection", "iterative", "submodular"),
)
def greedy_coverage_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_K} documents greedily maximizing distinct-trigram coverage
    of the corpus, with each pick's marginal gain (module docstring)."""
    tg = _doc_trigrams(spark, sf_dir).localCheckpoint(eager=False)
    selected: list[tuple[int, int, int]] = []
    for pos in range(1, _K + 1):
        ids = [d for _, d, _ in selected]
        if ids:
            covered = tg.filter(F.col("doc_id").isin(ids)).select("tg") \
                        .distinct()
            fresh = tg.join(covered, "tg", "left_anti")
        else:
            fresh = tg
        rows = (fresh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
                .orderBy(F.desc("gain"), "doc_id").limit(1).collect())
        if not rows:   # vocabulary exhausted before k picks (tiny corpus);
            break      # the oracle's empty s{r} drops the same rows
        selected.append((pos, int(rows[0]["doc_id"]), int(rows[0]["gain"])))
    return spark.createDataFrame(
        selected, "pos long, doc_id long, new_trigrams long").orderBy("pos")
