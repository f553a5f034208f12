"""Plan doctor: one reusable audit that codifies this repo's plan-shape
rules, so the anti-patterns the per-query gates in tests/test_plans.py
catch one at a time can be swept across WHOLE query families (and across
every new query by default, instead of only the ones someone remembered
to gate).

Checks (each finding is a short stable code + detail):
- ``cartesian``      CartesianProductExec anywhere. Broadcast cross joins
                     of 1-row aggregates compile to BroadcastNestedLoopJoin
                     and do NOT trigger this — only a true shuffled
                     cartesian does, which at 100 TB is always a bug
                     unless explicitly allowed.
- ``global-window``  A Window whose partition spec is empty (plan shows a
                     SinglePartition exchange feeding a Window): the
                     one-core global sort. Allowed only for curve-/
                     histogram-sized frames (offsets tables, KM/NA curves,
                     SAX segments) — callers allow it EXPLICITLY.
- ``python-row-udf`` BatchEvalPython = row-at-a-time Python UDF in the
                     plan. Never acceptable here (Arrow paths show up as
                     ArrowEvalPython / MapInPandas and are fine).
- ``unpushed-scan``  A parquet scan whose PushedFilters is empty while a
                     Filter sits directly above the scan's columnar read —
                     the predicate-pushdown miss.

``audit(df, allow=...)`` returns the list of findings NOT covered by the
allow set; an empty list is a clean bill. ``audit_query(spark, q, sf)``
runs a registered query's builder and audits the resulting frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import physical_plan

CHECKS = ("cartesian", "global-window", "python-row-udf", "unpushed-scan")


def findings(df: DataFrame) -> list[tuple[str, str]]:
    plan = physical_plan(df)
    out: list[tuple[str, str]] = []
    if "CartesianProduct" in plan:
        out.append(("cartesian",
                    f"{plan.count('CartesianProduct')} CartesianProduct "
                    "node(s)"))
    if "BatchEvalPython" in plan:
        out.append(("python-row-udf", "BatchEvalPython (row-at-a-time "
                    "Python UDF) in plan"))
    # Global window: the formatted plan shows the Window node's partition
    # spec; an empty spec arrives as "Exchange SinglePartition" feeding a
    # Window. Scan line-adjacency in the tree section.
    lines = plan.splitlines()
    if "Window" in plan and "SinglePartition" in plan:
        for i, line in enumerate(lines):
            if "Arguments" in line and "SinglePartition" in line:
                continue
            if "Exchange SinglePartition" in line:
                ctx = "\n".join(lines[max(0, i - 4): i + 2])
                if "Window" in ctx or "WindowGroupLimit" in ctx:
                    out.append(("global-window",
                                "Window over SinglePartition"))
                    break
    # Unpushed scan: a Filter node whose child is a parquet Scan that
    # pushed nothing. The details section lists per-node blocks; pair each
    # Scan's PushedFilters with whether any Filter references it above.
    if "PushedFilters: []" in plan and "Filter" in plan:
        for i, line in enumerate(lines):
            if "PushedFilters: []" in line:
                above = "\n".join(lines[max(0, i - 20): i])
                if "Filter (" in above or "+- Filter" in above:
                    out.append(("unpushed-scan",
                                "Filter above a scan with empty "
                                "PushedFilters"))
                    break
    return out


def audit(df: DataFrame, allow: tuple[str, ...] = ()) -> list[tuple[str, str]]:
    """Findings not covered by ``allow`` (a tuple of check codes)."""
    return [f for f in findings(df) if f[0] not in allow]
