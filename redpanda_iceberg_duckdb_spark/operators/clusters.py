"""Duplicate-cluster resolution: connected components over the near-dup pair
graph, producing one canonical document per cluster — the final step of a
dedup pipeline (pairs alone don't dedup; transitive groups do).

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round, every node takes the min label among itself and its
neighbors; converged when no label changes. Rounds needed = graph diameter
(near-dup clusters are tiny, so 2-4 rounds in practice; the iteration cap is
a safety net, and a warning is the correct behavior past it, not silent
wrong answers).

Scale: each round is one join edge⋈labels + one min-aggregate — all
shuffle-partitioned, no driver state beyond the loop counter and the
converged flag (a count aggregate). This is the standard large-graph CC
shape (cf. GraphX/Pregel) expressed in DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table
from .shingles import _TG_CTE_DUCK, _JACCARD_VERIFY_DUCK
from .text import _QUALITY_EXPR_DUCK


_DRIVER_CC_BOUND = 1 << 16


def _driver_union_find(rows: list) -> list[tuple[int, int]]:
    """(node, min-reachable-id) via path-compressed union-find — the exact
    semantics of the distributed min-label loop, in O(E alpha)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:            # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root == min label
    return sorted((n, find(n)) for n in parent)


def connected_components(edges: DataFrame, *, src: str = "d1", dst: str = "d2",
                         max_rounds: int = 20,
                         checkpoint_every: int = 5,
                         driver_bound: int = _DRIVER_CC_BOUND) -> DataFrame:
    """Min-label connected components over an undirected edge list.
    Returns (node, component) where component = min node id reachable.

    Small-graph fast path (round 14, the pq_train discipline): when the
    edge list fits ``driver_bound`` rows it is collected ONCE (bounded by
    the gate) and resolved with driver-side union-find — the distributed
    loop's per-round job floor (~0.3 s x rounds x stages on this box)
    dwarfs the actual work on candidate graphs with a few hundred edges
    (er_fuzzy_clusters measured 8.8 s -> sub-second). Past the gate the
    distributed min-label loop below is unchanged; a property test
    asserts both paths produce identical labels.

    Memory/lineage discipline for long loops: each round persists the new
    label table, materializes it via the convergence aggregate, then
    UNPERSISTS the previous round's table (otherwise every round leaks a
    cached copy).
    Every ``checkpoint_every`` rounds the labels are localCheckpoint'ed to
    truncate lineage — without this, deep graphs grow an O(rounds)-deep plan
    that eventually overwhelms the optimizer and task serialization."""
    # persist the caller's edge DAG BEFORE the symmetrize union — its two
    # branches otherwise each re-execute the (possibly expensive: the whole
    # LSH pipeline) edge computation once
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    if e.count() <= driver_bound:
        rows = [(r["a"], r["b"]) for r in e.collect()]   # gate-bounded
        e.unpersist()
        spark = edges.sparkSession
        return spark.createDataFrame(_driver_union_find(rows),
                                     "node long, comp long")
    und = (e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    und = und.persist()  # reused every round
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("comp")).persist()
    prev_sum = None  # empty graph: first sum is NULL == prev -> break
    for i in range(max_rounds):
        neighbor_min = (
            und.join(labels, und.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left_outer")
            .select("node", F.least(
                F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        # Convergence check without a join: labels only ever DECREASE
        # (comp' = least(comp, neighbor min) <= comp), so the label sum is
        # strictly monotone until fixpoint — equal sums <=> no node changed.
        # One scalar aggregate per round instead of join+filter+count; the
        # decimal cast keeps the sum exact at any node-id magnitude.
        label_sum = (new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"))
            .collect()[0][0])
        labels.unpersist()
        labels = new_labels
        if label_sum is None:
            # NULL sum is legitimate ONLY for an empty label table (no
            # edges). Under non-ANSI mode a decimal(38,0) overflow also
            # returns NULL — that must fail loudly, not masquerade as
            # convergence with silently-unconverged labels.
            if not new_labels.isEmpty():
                raise ArithmeticError(
                    "connected_components: label-sum overflowed decimal(38,0)"
                    " on a non-empty graph; node-id magnitude x node-count "
                    "exceeds the convergence check's range")
            break
        if i > 0 and label_sum == prev_sum:
            break
        prev_sum = label_sum
    und.unpersist()
    e.unpersist()
    return labels


@register(
    "dedup_clusters",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_JACCARD_VERIFY_DUCK.format(cand_filter="")},
edges AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
und AS (SELECT d1 a, d2 b FROM edges UNION ALL SELECT d2, d1 FROM edges),
comp AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM und
    UNION
    SELECT und.a, walk.comp FROM und JOIN walk ON und.b = walk.node
  )
  SELECT node, min(comp) AS comp FROM walk GROUP BY node)
SELECT comp AS cluster_id, count(*) AS cluster_size,
       cast(min(node) AS bigint) AS keep_doc_id
FROM comp GROUP BY comp
ORDER BY cluster_id""",
    tags=("dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH candidate pairs verified with exact
    Jaccard (>= 0.5) -> connected components -> one keep_doc_id (min) per
    cluster. The oracle computes the same components with a recursive CTE
    over exact-Jaccard edges; component id = min reachable doc.

    Scale note: edges come from the LSH path (bucketed, near-linear), NOT the
    quadratic all-pairs shingle join — at 100x data the all-pairs edge build
    is the pipeline's death. LSH-then-verify yields the same edge set as
    exact Jaccard whenever no true pair escapes every band
    (tests/test_planted_neardups.py asserts equality on this corpus)."""
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, sf_dir)
    comps = connected_components(pairs.select("d1", "d2"))
    return (
        comps.groupBy(F.col("comp").alias("cluster_id"))
        .agg(F.count(F.lit(1)).alias("cluster_size"),
             F.min("node").alias("keep_doc_id"))
        .orderBy("cluster_id")
    )


@register(
    "cluster_best_survivors",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_JACCARD_VERIFY_DUCK.format(cand_filter="")},
edges AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
und AS (SELECT d1 a, d2 b FROM edges UNION ALL SELECT d2, d1 FROM edges),
comp AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM und
    UNION
    SELECT und.a, walk.comp FROM und JOIN walk ON und.b = walk.node
  )
  SELECT node, min(comp) AS comp FROM walk GROUP BY node),
quality AS (
  SELECT doc_id, {_QUALITY_EXPR_DUCK} AS quality FROM documents),
scored AS (
  SELECT comp.comp, comp.node, quality.quality,
         row_number() OVER (PARTITION BY comp.comp
                            ORDER BY quality.quality DESC, comp.node) AS rk
  FROM comp JOIN quality ON quality.doc_id = comp.node)
SELECT comp AS cluster_id,
       count(*) AS cluster_size,
       cast(max(CASE WHEN rk = 1 THEN node END) AS bigint) AS best_doc_id,
       max(CASE WHEN rk = 1 THEN quality END) AS best_quality
FROM scored GROUP BY comp ORDER BY cluster_id""",
    tags=("dedup", "graph", "curation"),
)
def cluster_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection policy on top of dedup clustering: instead of
    "keep the min doc_id", keep the HIGHEST-QUALITY member of each near-dup
    cluster (ties on the 6-dp quality score break to the lower doc_id, so
    the choice is deterministic in both engines). This is the step a real
    curation pipeline runs between clustering and corpus assembly — dedup
    should discard the worse copies, not an arbitrary one.

    Plan shape: the cluster labels (tiny — one row per clustered doc) join
    the quality table, then a single max(struct) aggregate picks the
    survivor per cluster — no window, no second shuffle of the corpus."""
    from .dedup import minhash_lsh_pairs
    from .text import quality_score

    pairs = minhash_lsh_pairs(spark, sf_dir)
    comps = connected_components(pairs.select("d1", "d2"))
    quality = quality_score(spark, sf_dir)
    joined = comps.join(quality, comps.node == quality.doc_id)
    best = F.max(F.struct(F.col("quality").alias("q"),
                          (-F.col("node")).alias("neg_id")))
    return (joined.groupBy(F.col("comp").alias("cluster_id"))
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 (-best.getField("neg_id")).alias("best_doc_id"),
                 best.getField("q").alias("best_quality"))
            .orderBy("cluster_id"))


@register(
    "leakage_safe_splits",
    oracle=f"""
WITH {_TG_CTE_DUCK},
{_JACCARD_VERIFY_DUCK.format(cand_filter="")},
edges AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.5),
und AS (SELECT d1 a, d2 b FROM edges UNION ALL SELECT d2, d1 FROM edges),
comp AS (
  WITH RECURSIVE walk(node, comp) AS (
    SELECT a, a FROM und
    UNION
    SELECT und.a, walk.comp FROM und JOIN walk ON und.b = walk.node
  )
  SELECT node, min(comp) AS comp FROM walk GROUP BY node),
assigned AS (
  SELECT d.doc_id, d.source,
         coalesce(comp.comp, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp ON comp.node = d.doc_id),
split AS (
  SELECT doc_id, source,
         CASE WHEN {md5_mod_duck("cast(cluster_id AS varchar)", 10)} <= 7
              THEN 'train'
              WHEN {md5_mod_duck("cast(cluster_id AS varchar)", 10)} = 8
              THEN 'val' ELSE 'test' END AS split
  FROM assigned)
SELECT source, split, count(*) AS n_docs
FROM split GROUP BY source, split ORDER BY source, split""",
    tags=("dedup", "curation", "split"),
)
def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val/test split (80/10/10 by deterministic hash):
    every document inherits its near-dup CLUSTER's split assignment, so two
    near-duplicates can never land on opposite sides of the train/test
    boundary — the leakage-prevention step document-level hash splitting
    silently gets wrong. Singleton docs (no near-dup) hash on their own id.
    The hash is the cross-engine md5-u64 (functions/hashing.py) of the
    cluster id, so assignment is reproducible anywhere, shard-independent,
    and stable under re-runs — the properties a split function must have at
    100 TB (no RNG, no global sort, no state)."""
    from .dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    comps = connected_components(
        minhash_lsh_pairs(spark, sf_dir).select("d1", "d2"))
    assigned = (d.select("doc_id", "source")
                .join(comps, d.doc_id == comps.node, "left")
                .select("doc_id", "source",
                        F.coalesce("comp", "doc_id").alias("cluster_id")))
    bucket = F.expr(md5_mod_spark("cast(cluster_id as string)", 10))
    split = (F.when(bucket <= 7, "train")
             .when(bucket == 8, "val").otherwise("test"))
    return (assigned.select("source", split.alias("split"))
            .groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("source", "split"))
