"""Physical-plan inspection helpers: the tooling used to keep Catalyst plans
honest (filters pushed to the scan, dims broadcast, top-k not globally
sorted). tests/test_plans.py pins these properties so a regression in plan
shape fails CI, not just the benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan in the plan pushes a filter mentioning
    ``fragment`` (column name, typically)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line and "[]" not in line:
            return True
    return False


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def scan_read_schema(df: DataFrame, table_path_fragment: str) -> str:
    """The ReadSchema of the scan whose location matches the fragment —
    verifies column pruning (e.g. the fat ``text``/``notes`` column absent)."""
    plan = physical_plan(df)
    lines = plan.splitlines()
    current = ""
    for i, line in enumerate(lines):
        if "Location:" in line and table_path_fragment in line:
            current = "\n".join(lines[max(0, i - 6): i + 6])
    for line in current.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def exchange_count(df: DataFrame) -> int:
    """Shuffle-Exchange line count in the formatted plan (broadcast
    exchanges excluded) — the metric that decides a plan's fate at 100 TB.
    NOTE: the formatted explain lists each node twice (tree + details), so
    this is ~2x the physical shuffle count; use it for ceilings/regressions,
    not as an absolute."""
    plan = physical_plan(df)
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "BroadcastExchange" not in line
               and "Reused" not in line)
