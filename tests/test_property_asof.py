"""Property-based check of the generic asof_join: against a brute-force
per-row reference on randomized keyed timelines (ties, empty sides, multiple
rights at one timestamp all included)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from redpanda_iceberg_duckdb_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)

# (key, ts_offset_seconds, id) tuples; small domains force collisions.
row = st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 999))
rows = st.lists(row, min_size=0, max_size=25, unique_by=lambda r: r[2])


def brute_force(left, right):
    out = {}
    for (lk, lt, lid) in left:
        cands = [(rt, rid) for (rk, rt, rid) in right
                 if rk == lk and rt <= lt]
        out[lid] = max(cands)[1] if cands else None
    return out


@settings(max_examples=12, deadline=None)
@given(left=rows, right=rows)
def test_asof_matches_bruteforce(spark, left, right):
    mk = lambda rs: [(k, BASE + timedelta(seconds=t), i) for k, t, i in rs]  # noqa: E731
    ldf = spark.createDataFrame(mk(left) or [(0, BASE, -1)],
                                "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame(mk(right) or [(0, BASE, -1)],
                                "k long, ts timestamp, rid long")
    if not left:
        ldf = ldf.filter("lid >= 0")
    if not right:
        rdf = rdf.filter("rid >= 0")
    res = asof_join(ldf, rdf, key="k", ts="ts",
                    left_cols={"lid": "lid"}, right_cols={"rid": "rid"})
    got = {r.lid: r.rid for r in res.collect()}
    want = brute_force(left, right)
    assert got == want
