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

import re

from pyspark.sql import DataFrame

from . import physical_plan

CHECKS = ("cartesian", "global-window", "python-row-udf", "unpushed-scan")


def _tree_depth(line: str) -> int:
    m = re.search(r"[+:]-", line)
    return m.start() if m else -1  # root nodes have no connector


def _subtree_has_limit(plan: str, node_name: str, node_id: str) -> bool:
    """True when tree node ``(node_id)`` (a Window/Exchange) has a
    GlobalLimit or TakeOrderedAndProject on its DIRECT child chain: the
    plan itself then proves the single-partition input is k-row-bounded
    (the limit-then-rank idiom, e.g. graphrank's top-20), so a global
    window over it is not the one-core-sorts-the-corpus hazard.

    The scan stops at the first multi-child node (a join/union branch
    point, recognised by the ``:-`` non-last-child connector): a limit
    inside ONE branch of a join bounds that branch only, not the joined
    result, so it must not exempt the window (round-14 advice)."""
    tree = plan.split("\n\n", 1)[0]
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        if not re.search(rf"{node_name} \({node_id}\)", line):
            continue
        depth = _tree_depth(line)
        prev = depth
        for j in range(i + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if dj == -1 or dj <= depth:    # left the subtree
                break
            if dj <= prev:                 # sibling — chain already ended
                break
            if lines[j][dj] == ":":        # first child of a multi-child
                break                      # node: stop at the branch point
            if ("TakeOrderedAndProject" in lines[j]
                    or "GlobalLimit" in lines[j]):
                return True
            prev = dj
        return False
    return False


def _global_window_detail(plan: str) -> str | None:
    """Detect a Window with an EMPTY partition spec in FORMATTED explain
    output, two ways (the single-line ``Exchange SinglePartition`` form
    only appears in 'simple' explain — matching it was dead code,
    round-12 advice):

    1. an ``(n) Exchange`` whose details block says ``Arguments:
       SinglePartition`` feeding a Window/Sort chain in the tree — the
       dangerous repartition-to-one of distributed data;
    2. a ``(n) Window`` details block whose ``windowspecdefinition``'s
       FIRST argument is an ordering expression (``... ASC/DESC NULLS
       ...``): partition columns print before order columns and never
       carry a sort direction, so a leading direction means zero
       partition columns. This catches global windows whose child is
       already single-partition (e.g. a grid exploded from a 1-row
       aggregate — no Exchange node exists to match).

    Either way, a window whose subtree carries a GlobalLimit /
    TakeOrderedAndProject is exempt — the plan proves the input is
    k-row-bounded (_subtree_has_limit), no allowance needed."""
    spec_re = re.compile(
        r"windowspecdefinition\(\s*[^(),]*\s(?:ASC|DESC) NULLS")
    for block in re.split(r"\n\s*\n", plan):
        mb = re.match(r"\((\d+)\) Window\b", block.lstrip())
        if not mb:
            continue
        m = spec_re.search(block)
        if m and not _subtree_has_limit(plan, "Window", mb.group(1)):
            return ("Window with empty partition spec: "
                    + block[m.start():m.start() + 60])
    single_ids = set()
    for block in re.split(r"\n\s*\n", plan):
        m = re.match(r"\((\d+)\) Exchange\b", block.lstrip())
        if m and re.search(r"^Arguments:.*SinglePartition", block, re.M):
            single_ids.add(m.group(1))
    if not single_ids:
        return None
    tree = plan.split("\n\n", 1)[0]
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r"Exchange \((\d+)\)", line)
        if not m or m.group(1) not in single_ids:
            continue
        # Walk ancestors (lines above with strictly smaller connector
        # depth). Window sits above Sort above the exchange; stop at any
        # other node class — a HashAggregate/GlobalLimit parent is the
        # legitimate global-agg/limit shape, not a global window.
        depth = _tree_depth(line)
        hops = 0
        for j in range(i - 1, -1, -1):
            dj = _tree_depth(lines[j])
            if dj >= depth:
                continue
            name = lines[j]
            if "Window" in name:
                if _subtree_has_limit(plan, "Exchange", m.group(1)):
                    break          # k-row-bounded below the exchange
                return f"Window over SinglePartition exchange ({m.group(1)})"
            if re.search(r"\bSort\b|\bProject\b", name) and hops < 3:
                depth, hops = dj, hops + 1
                continue
            break
    return None


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
    lines = plan.splitlines()
    gw = _global_window_detail(plan)
    if gw:
        out.append(("global-window", gw))
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


def audit_query(spark, q, sf_dir: str,
                allow: tuple[str, ...] = ()) -> list[tuple[str, str]]:
    """Run a registered query's builder and audit the resulting frame."""
    return audit(q.fn(spark, sf_dir), allow=allow)
