"""Unit tests for the manifest fingerprint (verification.py) — pinned after
the round-8 advice found the relative-import anchor off-by-one made the
dependency hash a silent no-op (every candidate failed to resolve, so a
helper-only edit never invalidated its importers' green rows)."""

from __future__ import annotations

import inspect

from redpanda_iceberg_duckdb_spark import verification
from redpanda_iceberg_duckdb_spark.operators import graphrank, quantizer_train
from redpanda_iceberg_duckdb_spark.registry import all_queries

_PKG = "redpanda_iceberg_duckdb_spark"


def _deps(mod):
    return verification._dep_modules(mod.__name__, inspect.getsource(mod))


def test_single_dot_relative_import_resolves_to_sibling():
    # graphrank does `from .shingles import ...` and `from .dedup import ...`
    # — those must anchor at operators (the module's PACKAGE), not at
    # operators.graphrank itself (the old bug).
    deps = _deps(graphrank)
    assert f"{_PKG}.operators.shingles" in deps
    assert f"{_PKG}.operators.dedup" in deps


def test_double_dot_relative_import_climbs_one_package():
    # graphrank's `from ..registry import register` / `from ..tables import
    # load_table` must resolve to the package root modules.
    deps = _deps(graphrank)
    assert f"{_PKG}.registry" in deps
    assert f"{_PKG}.tables" in deps


def test_multiline_parenthesized_import_names_captured():
    # quantizer_train imports from .similarity with a multi-line
    # parenthesized list — the old line-regex stopped at the first physical
    # line; ast must see the module regardless.
    deps = _deps(quantizer_train)
    assert f"{_PKG}.operators.similarity" in deps


def test_deps_actually_contribute_to_query_sha(monkeypatch):
    """Editing a directly-imported helper module's source must change the
    importing query's sha (the manifest's advertised guarantee) and must
    NOT change the sha of a query that doesn't import it."""
    q_graph = all_queries()["pagerank_trade_graph"]   # imports .shingles
    q_other = all_queries()["bootstrap_ci_by_type"]   # does not
    before_graph = verification.query_sha(q_graph)
    before_other = verification.query_sha(q_other)

    orig = verification._module_source

    def patched(modname):
        src = orig(modname)
        if modname == f"{_PKG}.operators.shingles" and src is not None:
            return src + "\n# helper edited\n"
        return src

    monkeypatch.setattr(verification, "_module_source", patched)
    assert verification.query_sha(q_graph) != before_graph
    assert verification.query_sha(q_other) == before_other


def test_oracle_contributes_to_query_sha():
    q = all_queries()["pagerank_trade_graph"]

    class Tweaked:
        fn = q.fn
        oracle = (q.oracle or "") + " -- tweaked"

    assert verification.query_sha(Tweaked) != verification.query_sha(q)
