"""Local replica of the driver's correctness gate: run a registered query on
Spark and its oracle SQL on DuckDB over the same parquet, then compare
row count, column names, and (order-insensitively) every value exactly.

Exact comparison is intentionally stricter than any plausible driver hash —
if this passes, a value-hash comparison passes too.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from redpanda_iceberg_duckdb_spark.registry import Query
from redpanda_iceberg_duckdb_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # numpy scalars, Decimal
        import numpy as np

        if isinstance(v, np.generic):
            return _norm_cell(v.item())
    except ImportError:  # pragma: no cover
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _rows_sorted(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def run_compare(spark, q: Query, sf_dir: str) -> None:
    assert q.oracle is not None, f"{q.name} has no oracle"
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        cur = con.execute(q.oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{q.name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{q.name}: row count spark={len(s_rows)} duckdb={len(o_rows)}"
    )
    sn = _rows_sorted(s_cols, s_rows)
    on = _rows_sorted(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sn, on)):
        assert a == b, f"{q.name}: row {i} differs\n  spark : {a}\n  duckdb: {b}"
