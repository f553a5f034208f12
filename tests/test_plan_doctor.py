"""Plan-doctor sweep: every query in the CURRENT driver verify window
must pass the codified plan audit (plans/doctor.py) — cartesians,
global-sort windows, row-at-a-time Python UDFs, and unpushed scan
predicates are flagged by default and tolerated only via an explicit
per-query allowlist with a stated reason.

This generalizes the one-at-a-time gates in test_plans.py: a NEW query
entering the window is audited automatically, without anyone remembering
to write its gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from redpanda_iceberg_duckdb_spark.plans import doctor
from redpanda_iceberg_duckdb_spark.registry import all_queries

# (code, reason) tolerances. A query absent here must audit clean.
ALLOW: dict[str, dict[str, str]] = {
    # 1x1 scalar combines compile to a cartesian of single-row frames.
    "funnel_view_click_purchase": {
        "cartesian": "final 1x1x1 combine of per-step scalar aggregates"},
    # Curve-/histogram-sized frames: the window input is a groupBy
    # reduction bounded by distinct durations / scores / segments, the
    # accepted offsets pattern (scale8.stable_row_ids_two_phase).
    "average_precision_purchases": {
        "global-window": "offsets window over the score histogram (KBs)"},
    "nelson_aalen_hazard": {
        "global-window": "cumulative window over the distinct-duration "
                         "curve table"},
    "sax_hourly_motifs": {
        "global-window": "lead window over 4-hour PAA segments "
                         "(time-range-bounded)"},
    "runs_test_hourly": {
        "global-window": "lag over the time-range-bounded hourly grid "
                         "(run-boundary detection)"},
    "cramer_von_mises_value": {
        "global-window": "cumulative window over the distinct-value curve "
                         "table (price-lattice-bounded)"},
    "cox_ph_converged": {
        "global-window": "descending cumulative over the distinct-"
                         "duration curve table (retention-window-bounded)"},
    "logrank_signup_conversion": {
        "global-window": "descending cumulative over the distinct-"
                         "duration curve table (cox13's shared shape)"},
    "permutation_entropy_hourly": {
        "global-window": "lead window over the zero-filled hourly grid "
                         "(time-range-bounded; child is already a 1-row-"
                         "aggregate explode)"},
}

_WINDOW = [n for n in (entry_mod._VERIFY_FIRST
                       + entry_mod._PENDING_NEXT_WINDOW)
           # Streaming replays drive a full availableNow stream inside the
           # builder; their returned frame is a tiny telemetry table whose
           # plan says nothing about the streaming job — skip. Names not
           # yet registered (window slots pre-declared for queries being
           # built this round) are skipped here; the driver's
           # _ordered_queries applies the same existence filter.
           if "replay" not in n and n in all_queries()]


@pytest.mark.parametrize("name", _WINDOW)
def test_window_query_plan_audit(spark, sf_smoke, name):
    q = all_queries()[name]
    allow = tuple(ALLOW.get(name, {}))
    found = doctor.audit(q.fn(spark, sf_smoke), allow=allow)
    assert not found, (name, found)
