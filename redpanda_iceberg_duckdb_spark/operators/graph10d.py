"""k-core peeling and synchronous label propagation — the degeneracy and
community views of the rare-part co-purchase graph (same edge set as the
BFS/HITS tier, graph10b.py; reference has no graph surface at all — its
498 lines delegate everything to DuckDB SQL, /root/reference/duckdb/).

k-core (Seidman 1983, "Network structure and minimum degree"): repeatedly
delete vertices of degree < K until the remainder is the K-core. Executed
as at most R peel rounds, each ONE edge-to-survivor co-partitioned join
pair + one map-side-combinable degree count — the monotone-shrinking
iteration of clusters.py. Peeling is IDEMPOTENT at the fixpoint, so the
Spark loop's early exit (round removed nothing) is bit-equal to the
oracle's fully unrolled R rounds by construction; no convergence-detection
semantics leak into the contract. At 100 TB the survivor set only shrinks,
every round is one shuffle on the vertex key, and R is a constant cap.

Label propagation (Raghavan, Hu & Albert 2007, Phys. Rev. E 76): labels
init to the vertex id; each synchronous round every vertex adopts the
modal label among its neighbors, ties broken to the SMALLEST label — a
deterministic variant (the paper's random tie-break is replaced by min so
both engines agree). R=4 fixed rounds; each round is one co-partitioned
edge join + one count aggregate + one per-vertex argmax window (partitioned
by vertex — never a global sort). Output is the community-size histogram,
invariant to label identity churn.

Both oracles unroll the identical rounds as chained CTEs over the same
edge set — structurally different engines computing the same fixed-round
semantics on exact integers (degrees, counts, ids); no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..dataset_cache import data_fingerprint
from ..registry import register
from ..tables import load_table

_POP_CAP = 25    # rare-part cap: same skew guard as graph10b BFS/triangles
_K = 3           # core order
_PEELS = 8       # peel-round cap (idempotent past the fixpoint)
_LPA_ROUNDS = 4  # synchronous label-propagation rounds

# (applicationId, data fingerprint) -> checkpointed (src, dst) edge table.
# THREE queries iterate over the same rare-part co-purchase graph (BFS in
# graph10b, k-core and LPA here); the baskets-distinct + rare self-join
# build costs ~6 s at sf0.1 and depends only on the dataset — the same
# deliberate keyed-singleton reuse as graphrank._EDGE_CACHE (bounded,
# clear-then-insert, data-fingerprint keyed so an in-place parquet rewrite
# is a cache MISS, not a stale read).
_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _edges_sql() -> str:
    return f"""
baskets AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
rare AS (
  SELECT p FROM baskets GROUP BY p HAVING count(*) <= {_POP_CAP}),
e AS (
  SELECT DISTINCT a.c AS src, b.c AS dst
  FROM baskets a JOIN rare r ON r.p = a.p
  JOIN baskets b ON b.p = a.p AND b.c <> a.c)"""


def copurchase_vertex_count(spark: SparkSession, sf_dir: str) -> int:
    """Vertex count of the co-purchase graph — the iterate-row bound the
    r16 broadcast gate checks (graph_iterate module docstring). One count
    job per (application, dataset), shared by the five loop queries that
    iterate over this graph."""
    from .graph_iterate import vertex_count
    return vertex_count(
        spark, copurchase_edges(spark, sf_dir), "src",
        ("copurchase",
         data_fingerprint(sf_dir, "orders", "lineitem") or sf_dir))


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (src, dst) rare-part co-purchase edges, checkpointed and
    memoized per (application, dataset) — shared by BFS / k-core / LPA."""
    key = (spark.sparkContext.applicationId,
           data_fingerprint(sf_dir, "orders", "lineitem") or sf_dir)
    if key not in _EDGE_CACHE:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        baskets = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
                   .select(F.col("o_custkey").alias("c"),
                           F.col("l_partkey").alias("p"))
                   .distinct())
        rare = (baskets.groupBy("p").agg(F.count(F.lit(1)).alias("pop"))
                .filter(F.col("pop") <= _POP_CAP).select("p"))
        rb = baskets.join(rare, "p")
        e = (rb.select("p", F.col("c").alias("src"))
             .join(rb.select("p", F.col("c").alias("dst")), "p")
             .filter(F.col("src") != F.col("dst"))
             .select("src", "dst").distinct()
             .localCheckpoint(eager=False))
        _EDGE_CACHE.clear()
        _EDGE_CACHE[key] = e
    return _EDGE_CACHE[key]


def _kcore_oracle() -> str:
    rounds = []
    prev = "v0"
    for i in range(1, _PEELS + 1):
        # MATERIALIZED: each v{i} is referenced twice by the next round's
        # degree count — without it DuckDB inlines the whole chain and the
        # plan goes exponential in the round count (measured: 288 s at
        # sf0.001 inlined vs milliseconds materialized).
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT e.src AS c, count(*) AS dg
  FROM e JOIN {prev} a ON a.c = e.src JOIN {prev} b ON b.c = e.dst
  GROUP BY 1),
v{i} AS MATERIALIZED (SELECT c FROM d{i} WHERE dg >= {_K})""")
        prev = f"v{i}"
    return f"""
WITH {_edges_sql()},
v0 AS (SELECT DISTINCT src AS c FROM e),{','.join(rounds)},
dfin AS (
  SELECT e.src AS c, count(*) AS dg
  FROM e JOIN {prev} a ON a.c = e.src JOIN {prev} b ON b.c = e.dst
  GROUP BY 1)
SELECT cast(dg AS bigint) AS core_degree,
       cast(count(*) AS bigint) AS n_customers
FROM dfin GROUP BY 1 ORDER BY 1"""


@register(
    "kcore_degree_histogram",
    oracle=_kcore_oracle(),
    tags=("graph", "iterative", "scale-pattern"),
)
def kcore_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(core_degree, n_customers): within-core degree histogram of the
    3-core after <= 8 peel rounds over the rare-part co-purchase graph;
    early exit when a round removes nothing (idempotent, so bit-equal to
    the oracle's unrolled rounds — module docstring)."""
    from ..session import iterate_partitions, pinned_shuffle_partitions
    from .graph_iterate import iterate_join_strategy

    # r16 (verdict item 2): the r15 broadcast hints on the O(V) survivor
    # iterate are now gated on the measured vertex count — under the gate
    # the per-round joins stay BroadcastHashJoin (edge table never moves);
    # above it (the 100 TB regime, where an O(V) broadcast is an executor
    # OOM) the edge table is hash-partitioned by src once and persisted
    # and the src leg shuffles only the iterate; the dst leg is then a
    # plain shuffle join — the honest cost past the gate.
    edges, hint = iterate_join_strategy(
        spark, copurchase_edges(spark, sf_dir), "src",
        copurchase_vertex_count(spark, sf_dir),
        ("copurchase", data_fingerprint(sf_dir, "orders", "lineitem")
         or sf_dir))

    def _deg(surv: DataFrame) -> DataFrame:
        return (edges
                .join(hint(surv.withColumnRenamed("c", "src")),
                      "src")
                .join(hint(surv.withColumnRenamed("c", "dst")),
                      "dst")
                .groupBy("src").agg(F.count(F.lit(1)).alias("dg")))

    # r15 optimization (guide §2.2): survivor sets are O(V) iterates —
    # run the peel rounds at the loop shuffle width
    # (session.iterate_partitions, scale-adaptive) instead of full
    # session width per rung. Measured at sf0.1/local[32]: 2.7 -> 1.6 s
    # warm.
    with pinned_shuffle_partitions(spark, iterate_partitions(spark)):
        v = (edges.select(F.col("src").alias("c")).distinct()
             .localCheckpoint())
        n_prev = v.count()
        for _ in range(_PEELS):
            v = (_deg(v).filter(F.col("dg") >= _K)
                 .select(F.col("src").alias("c"))
                 .localCheckpoint())   # bound the iterative plan depth
            n_cur = v.count()      # ONE scalar per round (early-exit gate)
            if n_cur == n_prev:
                break
            n_prev = n_cur
    return (_deg(v)
            .select(F.col("dg").cast("long").alias("core_degree"))
            .groupBy("core_degree")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
            .orderBy("core_degree"))


def _lpa_oracle() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(f"""
s{i} AS (
  SELECT e.dst AS node, l.label, count(*) AS cnt
  FROM e JOIN {prev} l ON l.node = e.src GROUP BY 1, 2),
l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM s{i}) WHERE rn = 1)""")
        prev = f"l{i}"
    return f"""
WITH {_edges_sql()},
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),{','.join(rounds)},
sizes AS (SELECT label, count(*) AS sz FROM {prev} GROUP BY 1)
SELECT cast(sz AS bigint) AS community_size,
       cast(count(*) AS bigint) AS n_communities
FROM sizes GROUP BY 1 ORDER BY 1"""


@register(
    "label_propagation_sizes",
    oracle=_lpa_oracle(),
    tags=("graph", "iterative", "scale-pattern"),
)
def label_propagation_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(community_size, n_communities): community-size histogram after 4
    synchronous min-tie-break label-propagation rounds over the rare-part
    co-purchase graph (module docstring)."""
    from ..session import iterate_partitions, pinned_shuffle_partitions
    from .graph_iterate import iterate_join_strategy

    # r16 (verdict item 2): broadcast hint gated on vertex count; above
    # the gate the edge table is pre-partitioned by src once (pay-once
    # layout) and only the O(V) label iterate shuffles per round.
    edges, hint = iterate_join_strategy(
        spark, copurchase_edges(spark, sf_dir), "src",
        copurchase_vertex_count(spark, sf_dir),
        ("copurchase", data_fingerprint(sf_dir, "orders", "lineitem")
         or sf_dir))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    # r15 optimization (guide §2.2): label tables are O(V) iterates —
    # run the 4 propagation rounds at the loop shuffle width
    # (session.iterate_partitions, scale-adaptive). Measured at
    # sf0.1/local[32]: 4.5 -> 1.9 s warm.
    with pinned_shuffle_partitions(spark, iterate_partitions(spark)):
        for _ in range(_LPA_ROUNDS):
            scores = (edges
                      .join(hint(
                          labels.withColumnRenamed("node", "src")), "src")
                      .groupBy(F.col("dst").alias("node"), "label")
                      .agg(F.count(F.lit(1)).alias("cnt")))
            # argmax(cnt, ties -> min label) as ONE struct-max aggregate:
            # the (max cnt, max -label) ordering of a struct max IS the
            # mode with min tie-break — no per-node sort window, and the
            # second agg re-uses the (node)-side of the first shuffle.
            labels = (scores
                      .groupBy("node")
                      .agg(F.max(F.struct(F.col("cnt"),
                                          (-F.col("label")).alias("nl")))
                           .alias("m"))
                      .select("node", (-F.col("m.nl")).alias("label"))
                      .localCheckpoint())  # bound the iterative plan depth
    return (labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
            .groupBy(F.col("sz").cast("long").alias("community_size"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_communities"))
            .orderBy("community_size"))
