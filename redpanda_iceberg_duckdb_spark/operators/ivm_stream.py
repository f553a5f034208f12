"""Recurring incremental view maintenance, driver-checkable: k=4
successive delta batches applied through the REAL streaming maintenance
transform (streaming/ivm_sink.apply_delta — the same function the
foreachBatch sink runs per micro-batch), with the view state carried
forward batch to batch. operators/ivm.py proves ONE delta application;
this replay proves the RECURRING cycle the reference actually runs
(/root/reference/duckdb/query_and_publish.py re-executes its aggregates
every cycle; README.md's bidirectional refresh loop) stays bit-exact
against a from-scratch recompute after EVERY batch.

Batching: the order/lineitem timeline is cut at fixed dates; batch i
delivers orders with o_orderdate and lines with l_shipdate in
[T_{i-1}, T_i). Late data is intrinsic — a line whose shipdate falls in
batch 3 attaches to an order that arrived in batch 1 through the
state.orders ⋈ ΔL term. The state starts EMPTY, so every (order, line)
pair enters through the delta algebra exactly once — nothing is seeded by
a direct computation.

Scale stance: per batch, two broadcast delta joins (delta side broadcast,
state scanned map-side, never shuffled) + a customer-cardinality view
compaction; the per-batch localCheckpoint mirrors the sink's snapshot
write and truncates lineage so batch k's cost does not re-run batches
1..k-1. The oracle unrolls the same cycle as k direct recomputes at each
cutoff — the equality IS the IVM correctness claim, bit-exact because
every sum is decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..streaming.ivm_sink import apply_delta, empty_state, IvmState
from ..tables import load_table

# Exact per-line revenue, the ivm.py discipline.
_REV = ("cast(l_extendedprice as decimal(12,2))"
        " * cast(1 - l_discount as decimal(12,2))")

# Timeline cutoffs: state starts empty; batch i covers [T_{i-1}, T_i).
# The last batch is unbounded, so the final view equals the full join.
_CUTS = ["1998-01-01", "2000-01-01", "2001-01-01"]


def _batch_bounds() -> list[tuple[str | None, str | None]]:
    lows = [None] + _CUTS
    highs = _CUTS + [None]
    return list(zip(lows, highs))


def _oracle() -> str:
    parts = []
    for i, (_lo, hi) in enumerate(_batch_bounds(), 1):
        where = (f"WHERE o.o_orderdate < TIMESTAMP '{hi}' "
                 f"AND l.l_shipdate < TIMESTAMP '{hi}'" if hi else "")
        parts.append(f"""
SELECT {i} AS batch_id, o.o_custkey AS c_custkey,
       cast(sum({_REV}) AS double) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
{where}
GROUP BY 2""")
    return "\nUNION ALL".join(parts) + "\nORDER BY batch_id, c_custkey"


@register(
    "ivm_stream_refresh_replay",
    oracle=_oracle(),
    tags=("ivm", "streaming", "incremental", "replay", "scale-pattern"),
)
def ivm_stream_refresh_replay(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """(batch_id, c_custkey, revenue): the maintained view AFTER each of 4
    delta batches, every batch applied through the streaming sink's own
    apply_delta. Oracle = direct full recompute at each cutoff, so a green
    row proves repeated maintenance never drifts — per pair-of-batches, no
    double counting, no missed late lines, bit-exact decimal sums."""
    orders = load_table(spark, sf_dir, "orders")
    line = load_table(spark, sf_dir, "lineitem")

    state = empty_state(spark)
    views = []
    for i, (lo, hi) in enumerate(_batch_bounds(), 1):
        def rng(col, lo=lo, hi=hi):
            cond = F.lit(True)
            if lo:
                cond = cond & (col >= F.lit(lo).cast("timestamp"))
            if hi:
                cond = cond & (col < F.lit(hi).cast("timestamp"))
            return cond
        d_o = (orders.filter(rng(F.col("o_orderdate")))
               .select("o_orderkey", "o_custkey"))
        d_l = (line.filter(rng(F.col("l_shipdate")))
               .select("l_orderkey", F.expr(_REV).alias("rev")))
        nxt = apply_delta(state, d_o, d_l)
        # Mirror of the sink's per-batch snapshot write: materialize the
        # state once so batch i+1 (and the final stacked output) reads
        # blocks instead of re-deriving batches 1..i.
        state = IvmState(nxt.view.localCheckpoint(eager=False),
                         nxt.orders.localCheckpoint(eager=False),
                         nxt.lines.localCheckpoint(eager=False))
        views.append(state.view.select(
            F.lit(i).alias("batch_id"), "c_custkey",
            F.col("revenue").cast("double").alias("revenue")))

    out = views[0]
    for v in views[1:]:
        out = out.unionByName(v)
    return out.orderBy("batch_id", "c_custkey")


# ------------------------------------------------- retractions (Z-sets)

# Deterministic retraction predicate: batch R withdraws every line whose
# orderkey ≡ 3 (mod 7) — a fixed ~14% slice of the corpus.
_RETRACT_MOD, _RETRACT_RES = 7, 3


def _retract_oracle() -> str:
    live = (f"SELECT o.o_custkey, {_REV} AS rev "
            "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey")
    return f"""
SELECT 1 AS batch_id, o_custkey AS c_custkey,
       cast(sum(rev) AS double) AS revenue
FROM ({live}) GROUP BY 2
UNION ALL
SELECT 2 AS batch_id, o.o_custkey AS c_custkey,
       cast(sum({_REV}) AS double) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_orderkey % {_RETRACT_MOD} <> {_RETRACT_RES}
GROUP BY 2
ORDER BY batch_id, c_custkey"""


@register(
    "ivm_retraction_replay",
    oracle=_retract_oracle(),
    tags=("ivm", "streaming", "incremental", "replay", "scale-pattern"),
)
def ivm_retraction_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-set deletes through the UNCHANGED maintenance transform: batch 1
    ingests the whole corpus; batch 2 RETRACTS a fixed ~14% slice of the
    lines by feeding the same rows with NEGATED revenue (the changelog
    retraction encoding — Blakeley's delta algebra is linear in the
    measure, so deletion is insertion of a negative multiplicity and
    apply_delta needs no delete-specific code path). Oracle = direct
    recompute over the surviving lines after each batch. Customers whose
    every line was withdrawn net to EXACTLY decimal zero (another reason
    the sums must be decimal, not float) and are dropped to match the
    oracle's inner-join shape — the Z-set "support" projection."""
    orders = load_table(spark, sf_dir, "orders")
    line = load_table(spark, sf_dir, "lineitem")

    state = empty_state(spark)
    views = []
    d_o = orders.select("o_orderkey", "o_custkey")
    batches = [
        line.select("l_orderkey", F.expr(_REV).alias("rev")),
        line.filter(
            F.pmod("l_orderkey", _RETRACT_MOD) == _RETRACT_RES)
        .select("l_orderkey", (-F.expr(_REV)).alias("rev")),
    ]
    for i, d_l in enumerate(batches, 1):
        nxt = apply_delta(state, d_o if i == 1 else
                          d_o.limit(0), d_l)
        state = IvmState(nxt.view.localCheckpoint(eager=False),
                         nxt.orders.localCheckpoint(eager=False),
                         nxt.lines.localCheckpoint(eager=False))
        views.append(state.view
                     .filter(F.col("revenue") != 0)   # Z-set support
                     .select(F.lit(i).alias("batch_id"), "c_custkey",
                             F.col("revenue").cast("double")
                             .alias("revenue")))
    out = views[0]
    for v in views[1:]:
        out = out.unionByName(v)
    return out.orderBy("batch_id", "c_custkey")


# -------------------------------------------- state-size accounting (r13)

def _state_oracle() -> str:
    """Expected cardinality of each maintained state table after every
    batch (round-12 verdict item 6, the ivm edition of
    stream_state_expected): orders state holds every order seen so far,
    lines state compacts to one row per order with any line seen, and the
    view holds one row per customer with at least one MATCHED (order,
    line) pair — i.e. min over the customer's orders of max(o_orderdate,
    first l_shipdate) is below the cut."""
    parts = []
    for i, (_lo, hi) in enumerate(_batch_bounds(), 1):
        wo = f"WHERE o_orderdate < TIMESTAMP '{hi}'" if hi else ""
        wl = f"WHERE l_shipdate < TIMESTAMP '{hi}'" if hi else ""
        wv = (f"WHERE o.o_orderdate < TIMESTAMP '{hi}' "
              f"AND l.l_shipdate < TIMESTAMP '{hi}'" if hi else "")
        parts.append(f"""
SELECT {i} AS batch_id,
       (SELECT cast(count(*) AS bigint) FROM orders {wo}) AS orders_rows,
       (SELECT cast(count(DISTINCT l_orderkey) AS bigint)
        FROM lineitem {wl}) AS lines_rows,
       (SELECT cast(count(DISTINCT o.o_custkey) AS bigint)
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        {wv}) AS view_rows""")
    return "\nUNION ALL".join(parts) + "\nORDER BY batch_id"


@register(
    "ivm_state_expected",
    oracle=_state_oracle(),
    tags=("ivm", "streaming", "state", "metrics"),
)
def ivm_state_expected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED per-batch state-table cardinalities of the streaming IVM
    sink (orders / lines / view rows — _state_oracle docstring); the real
    apply_delta state is asserted equal table-for-table, batch-for-batch
    in test_round10_ops.py. Proves the maintained state stays order/
    customer-cardinality, never line-cardinality.

    Scale stance: orders and lineitem each reduce ONCE to per-order rows
    (orderkey, custkey, o_orderdate / first l_shipdate); only those
    O(orders) frames fan out over the broadcast 4-row cut grid. No
    window, no repeated fact scans."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    ol = line.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"))
    per_order = (orders.join(ol,
                             orders.o_orderkey == ol.l_orderkey,
                             "left_outer")
                 .select("o_orderkey", "o_custkey", "o_orderdate",
                         "first_ship",
                         # Spark's greatest() IGNORES nulls (returns the
                         # non-null side), so a line-less order must be
                         # nulled explicitly or it would count as matched.
                         F.when(F.col("first_ship").isNotNull(),
                                F.greatest("o_orderdate", "first_ship"))
                         .alias("pair_date")))
    cuts = spark.createDataFrame(
        [(i, hi) for i, (_lo, hi) in enumerate(_batch_bounds(), 1)],
        "batch_id int, hi string")
    hi_ts = F.col("hi").cast("timestamp")
    before = lambda c: F.col("hi").isNull() | (F.col(c) < hi_ts)  # noqa: E731
    g = per_order.crossJoin(F.broadcast(cuts))
    counts = g.groupBy("batch_id").agg(
        F.count(F.when(before("o_orderdate"), 1)).cast("long")
         .alias("orders_rows"),
        F.count(F.when(before("first_ship")
                       & F.col("first_ship").isNotNull(), 1)).cast("long")
         .alias("lines_rows"),
        F.count_distinct(
            F.when(before("pair_date") & F.col("pair_date").isNotNull(),
                   F.col("o_custkey"))).cast("long").alias("view_rows"))
    return counts.orderBy("batch_id")
