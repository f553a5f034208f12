"""Property test: DataFrame connected components == union-find reference on
random graphs (hypothesis-generated edge lists, including multi-component,
self-loop, and chain topologies that stress the iteration/convergence path).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redpanda_iceberg_duckdb_spark.operators.clusters import (
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min reachable node, matching the operator's contract
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=60))
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r.node: r.comp
           for r in connected_components(df, max_rounds=50).collect()}
    want = _union_find(edges)
    assert got == want
    # Since round 14 small graphs take the driver union-find fast path, so
    # the assertion above alone would no longer exercise the distributed
    # loop — force it (driver_bound=0) and assert BOTH paths agree.
    dist = {r.node: r.comp
            for r in connected_components(df, max_rounds=50,
                                          driver_bound=0).collect()}
    assert dist == want
