"""Dataset fingerprinting for application-scoped DataFrame caches.

Why a separate module (and not tables.py): the verification manifest
fingerprints each query as (defining module + one level of intra-package
imports); tables.py is a dependency of every operator module, so adding a
helper there would invalidate all ~230 fingerprints at once. This module
is imported only by the cache users (operators/graphrank.py,
operators/quantizer_train.py), bounding the invalidation to their queries.
"""

from __future__ import annotations

import os


def data_fingerprint(sf_dir: str, *names: str) -> str:
    """Cheap driver-side fingerprint of the named parquet tables under
    ``sf_dir``, for keying dataset-scoped caches: per file (path, inode,
    mtime_ns, size) plus the parquet footer length+magic tail bytes.

    Why: per-(applicationId, sf_dir) memoization (graphrank._EDGE_CACHE,
    quantizer_train._TRAIN_CACHE) silently serves stale checkpointed blocks
    if the parquet under an sf_dir is REWRITTEN within one Spark application
    — exactly what bench demos do with tmp dirs (round-9 advice). Folding
    the files' stat signature into the key makes a rewrite a cache miss
    instead of a correctness hazard. st_ino + the 8-byte parquet tail
    (footer length || 'PAR1') close the round-10 ADVICE #2 residual: a
    same-size rewrite landing within a coarse filesystem's mtime
    granularity still changes the inode on any atomic-rename writer, and
    a true in-place rewrite still moves the footer offset. O(#files) stat
    calls + one 8-byte read per file, no data scan."""
    parts = []
    for name in sorted(names):
        root = os.path.join(sf_dir, f"{name}.parquet")
        paths = [root]
        if os.path.isdir(root):
            paths = [os.path.join(root, f) for f in sorted(os.listdir(root))]
        for p in paths:
            try:
                st = os.stat(p)
                tail = b""
                if st.st_size >= 8:
                    with open(p, "rb") as fh:
                        fh.seek(-8, os.SEEK_END)
                        tail = fh.read(8)
                parts.append(f"{p}:{st.st_ino}:{st.st_mtime_ns}"
                             f":{st.st_size}:{tail.hex()}")
            except OSError:
                parts.append(f"{p}:absent")
    return "|".join(parts)
