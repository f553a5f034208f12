"""Custom stateful streaming operator via applyInPandasWithState: per-user
running aggregates that survive across micro-batches (the escape hatch for
streaming semantics the built-in windowed aggregations can't express —
arbitrary per-key state machines).

Scale: state lives in the state store, partitioned by the grouping key —
per-key state is a handful of scalars, so state size is O(distinct users),
not O(events). The same pattern carries fraud scoring, per-session feature
accumulation, CDC merge logic, etc.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value_cents", T.LongType()),
    T.StructField("max_value_cents", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total_cents", T.LongType()),
    T.StructField("max_cents", T.LongType()),
])


def _half_up_cents(values: pd.Series) -> pd.Series:
    """Integer cents with half-away-from-zero midpoints — the same policy as
    Spark's ROUND / functions.__init__ (pandas .round() is half-to-even and
    would diverge on exact midpoints like 1.005 stored as 100.5 cents)."""
    import numpy as np

    scaled = values.astype("float64") * 100
    return pd.Series(
        np.sign(scaled) * np.floor(np.abs(scaled) + 0.5),
        index=values.index).astype("int64")


def _accumulate(key, batches: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (count, integer-cent total, max) state and
    emit the updated running aggregate. Money is kept in integer cents so
    cross-batch accumulation is exact regardless of arrival order. The max
    is seeded from the data, never from 0 — an all-negative stream must
    report its true (negative) max."""
    n, total, mx = state.get if state.exists else (0, 0, None)
    for pdf in batches:
        cents = _half_up_cents(pdf["value"])
        n += len(pdf)
        total += int(cents.sum())
        if len(cents):
            bmx = int(cents.max())
            mx = bmx if mx is None else max(mx, bmx)
    state.update((n, total, mx))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n],
        "total_value_cents": [total], "max_value_cents": [mx],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
