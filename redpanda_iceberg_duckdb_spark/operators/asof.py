"""As-of join: for each left event, the most recent right event at or before
it, per key. Spark has no native ASOF JOIN; this implements it two ways:

1. union + window (the scale path): tag both sides, sort within key by
   (ts, side, id), and carry the last-seen right row forward with
   last_value(ignore nulls). One shuffle on the key, one per-partition sort,
   no range-join explosion — this is how you as-of-join two 10-TB tables.
2. applyInPandas + pandas.merge_asof (the Arrow path): per-key grouped map,
   demonstrating the custom-operator escape hatch for semantics that
   DataFrame ops can't express. Same results, same oracle.

Demo instance: each 'purchase' event matched to the user's latest 'signup'
at or before it. Ties on ts resolve to the larger event_id (right side sorts
before left at equal ts, so exact matches are allowed).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_left
  FROM events WHERE event_type IN ('purchase', 'signup')),
w AS (
  SELECT user_id, ts, event_id, is_left,
         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_left, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_id,
         last_value(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_left, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_ts
  FROM tagged)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       signup_id, signup_ts,
       CASE WHEN signup_ts IS NOT NULL
            THEN epoch_us(ts) - epoch_us(signup_ts) END AS gap_us
FROM w WHERE is_left = 1
ORDER BY purchase_id"""


def asof_join(left: DataFrame, right: DataFrame, *, key: str, ts: str,
              left_cols: dict[str, str], right_cols: dict[str, str]) -> DataFrame:
    """Generic union+window as-of join (backward, allowing exact matches).

    left_cols / right_cols: {source_col: output_alias} carried from each side.
    Returns one row per left row with the latest right row's columns (null if
    none precedes).
    """
    l2 = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c).alias(a) for c, a in left_cols.items()],
    )
    r2 = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(a) for c, a in right_cols.items()],
    )
    for a in right_cols.values():
        l2 = l2.withColumn(a, F.lit(None).cast(dict(r2.dtypes)[a]))
    for a in left_cols.values():
        r2 = r2.withColumn(a, F.lit(None).cast(dict(l2.dtypes)[a]))
    cols = ["_k", "_ts", "_is_left", *left_cols.values(), *right_cols.values()]
    u = l2.select(*cols).unionByName(r2.select(*cols))
    # Rights sort before lefts at equal ts (exact matches allowed); rights at
    # equal ts order by their id so "latest" ties break to the larger id.
    order = [F.col("_ts"), F.col("_is_left"),
             F.col(next(iter(right_cols.values())))]
    w = (W.partitionBy("_k").orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    carried = u.select(
        "*", *[
            F.last(F.when(F.col("_is_left") == 0, F.col(a)), ignorenulls=True)
            .over(w).alias(f"_r_{a}")
            for a in right_cols.values()
        ]
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        F.col("_k").alias(key), F.col("_ts").alias(ts),
        *[F.col(a) for a in left_cols.values()],
        *[F.col(f"_r_{a}").alias(a) for a in right_cols.values()],
    )
    return out


@register("asof_join_window", oracle=_ASOF_ORACLE, bench=True, tags=("asof", "join"))
def asof_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase->latest-signup as-of join via the union+window strategy."""
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "signup")
    joined = asof_join(
        left, right.withColumn("r_ts", F.col("ts")), key="user_id", ts="ts",
        left_cols={"event_id": "purchase_id"},
        right_cols={"event_id": "signup_id", "r_ts": "signup_ts"},
    )
    return joined.select(
        "purchase_id", "user_id", F.col("ts").alias("purchase_ts"),
        "signup_id", "signup_ts",
        F.when(F.col("signup_ts").isNotNull(),
               F.unix_micros("ts") - F.unix_micros("signup_ts"))
        .alias("gap_us"),
    ).orderBy("purchase_id")


@register("asof_join_pandas", oracle=_ASOF_ORACLE, tags=("asof", "join", "pandas_udf"))
def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of join via applyInPandas + pd.merge_asof per user group —
    the Arrow-batched escape hatch for non-SQL-expressible operators. Grouped
    by the join key, so each pandas invocation sees one user's events; state
    never leaves the executor."""
    e = load_table(spark, sf_dir, "events")
    both = (e.filter(F.col("event_type").isin("purchase", "signup"))
            .select("user_id", "ts", "event_id", "event_type"))

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        lt = (pdf[pdf.event_type == "purchase"]
              .sort_values(["ts", "event_id"])
              .rename(columns={"event_id": "purchase_id", "ts": "purchase_ts"})
              [["purchase_id", "user_id", "purchase_ts"]])
        rt = (pdf[pdf.event_type == "signup"]
              .sort_values(["ts", "event_id"])
              .rename(columns={"event_id": "signup_id", "ts": "signup_ts"})
              [["signup_id", "signup_ts"]])
        if lt.empty:
            return pd.DataFrame(columns=[
                "purchase_id", "user_id", "purchase_ts",
                "signup_id", "signup_ts", "gap_us"])
        if rt.empty:
            out = lt.copy()
            out["signup_id"] = pd.array([None] * len(out), dtype="Int64")
            out["signup_ts"] = pd.NaT
            out["gap_us"] = pd.array([None] * len(out), dtype="Int64")
            return out
        merged = pd.merge_asof(
            lt, rt, left_on="purchase_ts", right_on="signup_ts",
            direction="backward", allow_exact_matches=True)
        gap = (merged.purchase_ts - merged.signup_ts)
        merged["gap_us"] = (gap / pd.Timedelta(microseconds=1)).astype("Int64")
        merged["signup_id"] = merged["signup_id"].astype("Int64")
        return merged[["purchase_id", "user_id", "purchase_ts",
                       "signup_id", "signup_ts", "gap_us"]]

    schema = ("purchase_id long, user_id long, purchase_ts timestamp, "
              "signup_id long, signup_ts timestamp, gap_us long")
    return (both.groupBy("user_id").applyInPandas(per_user, schema=schema)
            .orderBy("purchase_id"))
