"""Mechanized re-verification trigger (round-8 verdict item 2).

The driver's correctness gate checks only the first 50 queries each round,
so the cumulative-green claim for the tail rests on "nothing changed since
that query's last green row". Through round 7 that rested on the builder
hand-curating __spark_entry__._VERIFY_FIRST; this module replaces the
trust with a committed manifest:

    verification_manifest.json : {query: {"sha": <hex>, "evidence": <tag>}}

``sha`` fingerprints everything that can change a query's semantics that
we can see statically: the source of the module defining the query fn,
the sources of the package modules it imports (one relative level — this
is what catches a helper fix in shingles.py invalidating setsim/graphrank
queries, the exact failure mode round 7 handled by hand), and the oracle
SQL. ``evidence`` is the CORRECTNESS_r{N} round whose green row proves the
CURRENT sha, or "window-r{N}" meaning the query sits in round N's 50-slot
verify window awaiting that row.

tests/test_driver_contract.py DERIVES the must-verify set: every query
whose current sha mismatches its manifest entry (or has no entry) must be
inside the live window or the pending queue — a silent edit to any query
or helper now fails the suite instead of silently voiding an old green
row. tools/regen_manifest.py refreshes entries for windowed queries.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import os

_PKG = "redpanda_iceberg_duckdb_spark"
_MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "verification_manifest.json")


def _module_source(modname: str) -> str | None:
    try:
        mod = importlib.import_module(modname)
        return inspect.getsource(mod)
    except (ImportError, OSError, TypeError):
        return None


def _dep_modules(modname: str, src: str) -> list[str]:
    """Absolute candidate module names imported by ``src`` (the source of
    module ``modname``), restricted to this package. Parsed with the ast
    module (round-8 advice: the old line-regex missed continuation lines of
    parenthesized imports, and its anchor arithmetic resolved `from .x` to
    a child of the importing MODULE instead of its package, so no dep ever
    resolved). Both `from .x import y` with y a symbol and y a submodule
    are emitted — candidates that aren't real modules drop out in
    _module_source."""
    parts = modname.split(".")
    cands: list[str] = []
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.ImportFrom):
            if node.level:
                # `from .x` in pkg.operators.dedup anchors at pkg.operators
                # (one package climb per extra leading dot).
                anchor = parts[: len(parts) - node.level]
                base = ".".join(anchor + ([node.module] if node.module
                                          else []))
            else:
                base = node.module or ""
            if base:
                cands.append(base)
                cands.extend(f"{base}.{a.name}" for a in node.names
                             if a.name != "*")
        elif isinstance(node, ast.Import):
            cands.extend(a.name for a in node.names)
    seen: set[str] = set()
    out: list[str] = []
    for c in cands:
        if c.startswith(_PKG) and c != modname and c not in seen:
            seen.add(c)
            out.append(c)
    return out


def query_sha(q) -> str:
    """Fingerprint of a registered Query: defining-module source, one level
    of intra-package imported-module sources, and the oracle SQL."""
    mod = inspect.getmodule(q.fn)
    src = inspect.getsource(mod)
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\x00")
    h.update((q.oracle or "").encode())
    for cand in _dep_modules(mod.__name__, src):
        dep = _module_source(cand)
        if dep is not None:
            h.update(b"\x01" + cand.encode() + b"\x00")
            h.update(dep.encode())
    return h.hexdigest()


def current_shas() -> dict[str, str]:
    from .registry import all_queries
    return {name: query_sha(q) for name, q in all_queries().items()}


def load_manifest() -> dict[str, dict]:
    if not os.path.exists(_MANIFEST_PATH):
        return {}
    with open(_MANIFEST_PATH) as f:
        return json.load(f)


def save_manifest(m: dict[str, dict]) -> None:
    with open(_MANIFEST_PATH, "w") as f:
        json.dump(dict(sorted(m.items())), f, indent=1, sort_keys=True)
        f.write("\n")


def must_verify(shas: dict[str, str] | None = None) -> set[str]:
    """Queries whose current fingerprint is not backed by the manifest —
    the mechanically derived 'needs a driver-green row' set."""
    manifest = load_manifest()
    shas = shas or current_shas()
    return {name for name, sha in shas.items()
            if manifest.get(name, {}).get("sha") != sha}
