"""Refresh verification_manifest.json (see verification.py for the design).

Usage:
    python tools/regen_manifest.py r08            # during round 8 builds
    python tools/regen_manifest.py r08 --promote  # after CORRECTNESS_r08.json

Build mode: for every query whose current sha mismatches its manifest entry,
update the entry to {sha: current, evidence: window-<round>} IF the query is
inside the driver's 50-slot window or the pending queue; otherwise exit
nonzero listing the queries the builder must add to _VERIFY_FIRST (or queue).

Promote mode: convert "window-rNN" evidence to "rNN" for queries holding a
green row in CORRECTNESS_rNN.json whose sha is unchanged — run at the start
of the NEXT round, before editing anything.

Rehash mode (--rehash): recompute every entry's sha in place, KEEPING its
evidence tag. Only sound immediately after a change to the fingerprint
ALGORITHM itself (verification.py) on a tree where no query/helper source
has changed since each entry's evidence — i.e. run it as the very next
commit after the algorithm edit, before touching any operator module. The
r09 use: the ast-based dependency resolution fix changed every sha (deps
now actually contribute) without changing any query's semantics.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_iceberg_duckdb_spark.verification import (  # noqa: E402
    current_shas, load_manifest, save_manifest)


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else None
    promote = "--promote" in sys.argv
    if not rnd or not rnd.startswith("r") or not rnd[1:].isdigit():
        print(__doc__)
        return 2
    # Zero-pad so evidence tags stay machine-comparable with CORRECTNESS_rNN
    # file names ("r9" and "r09" forked in round 9 — normalize at the door).
    rnd = f"r{int(rnd[1:]):02d}"

    import __spark_entry__ as entry_mod

    manifest = load_manifest()
    shas = current_shas()
    names = list(entry_mod.queries())
    window = set(names[:50])
    pending = set(entry_mod._PENDING_NEXT_WINDOW)

    if "--rehash" in sys.argv:
        n_re = 0
        for n, e in manifest.items():
            if n in shas and e.get("sha") != shas[n]:
                e["sha"] = shas[n]
                n_re += 1
        save_manifest(manifest)
        print(f"rehashed {n_re} entries (evidence tags preserved)")
        return 0

    if promote:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f"CORRECTNESS_{rnd}.json")
        with open(path) as f:
            rows = json.load(f)
        greens = {n for n, v in rows.items()
                  if not v.get("err") and v.get("rows_match")
                  and v.get("schema_match") and v.get("hash_match")}
        def _older(tag: str) -> bool:
            # window-rMM refreshes only for MM <= NN: a window tag from a
            # LATER round means the code changed after this CORRECTNESS
            # file was recorded — its green row does not cover the current
            # sha even though the sha comparison passes (both sides are
            # the post-change sha). rNN refreshes if older than rnd.
            if tag.startswith("window-r"):
                suf = tag[len("window-r"):]
                if not suf.isdigit():
                    print(f"warning: unparseable evidence tag {tag!r} — "
                          "treating as refreshable")
                    return True
                return int(suf) <= int(rnd[1:])
            if not (tag.startswith("r") and tag[1:].isdigit()):
                # Absent or malformed tags (the 'window-' fallback default)
                # must be promotable, or the miss is silent forever.
                print(f"warning: unparseable evidence tag {tag!r} — "
                      "treating as refreshable")
                return True
            return int(tag[1:]) < int(rnd[1:])

        n_prom = 0
        for n, e in manifest.items():
            # ANY unchanged-sha query with a green row this round gets the
            # fresher evidence tag — not only window-* entries. (Rotation
            # slots used to re-verify old-evidence queries without the
            # manifest recording it; round-14 fix.)
            if (n in greens and shas.get(n) == e["sha"]
                    and _older(e.get("evidence", "window-"))):
                e["evidence"] = rnd
                n_prom += 1
        save_manifest(manifest)
        print(f"promoted {n_prom} entries to evidence={rnd}")
        return 0

    blocked = []
    refreshed = []
    for n, sha in shas.items():
        if manifest.get(n, {}).get("sha") == sha:
            continue
        if n in window or n in pending:
            manifest[n] = {"sha": sha, "evidence": f"window-{rnd}"}
            refreshed.append(n)
        else:
            blocked.append(n)
    if blocked:
        print("ERROR: changed/new queries outside the verify window and "
              "pending queue — add them to _VERIFY_FIRST or "
              "_PENDING_NEXT_WINDOW first:")
        for n in sorted(blocked):
            print("  ", n)
        return 1
    save_manifest(manifest)
    print(f"refreshed {len(refreshed)} entries -> evidence=window-{rnd}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
