"""Atomic, fingerprint-keyed temp-dir staging for fixture inputs.

Several queries stage derived inputs under the system temp dir (menu .txt
files for the binaryFile source, micros-timestamp events for the stream
reader, CSV/JSON round-trip files). /tmp is SHARED between concurrent
pytest, bench, and driver runs, so staging must be:

  * atomic — build into a unique scratch dir, then ``os.rename`` into the
    final path: readers either see a complete directory or none at all,
    never a half-written one (two concurrent stagers both build; one wins
    the rename, the loser's scratch is discarded);
  * staleness-proof — the final dir name embeds a fingerprint of the
    SOURCE file (mtime + size), so regenerated testdata gets a fresh stage
    instead of silently reusing the old one.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable


def source_fingerprint(*paths: str) -> str:
    """Cheap content key for staging dirs: (path, mtime_ns, size) per
    source file, hashed. Changes whenever the testdata is regenerated."""
    h = hashlib.md5()
    for p in paths:
        st = os.stat(p)
        h.update(f"{p}|{st.st_mtime_ns}|{st.st_size}".encode())
    return h.hexdigest()[:10]


def stage_once(name: str, fingerprint: str, build: Callable[[str], None]) -> str:
    """Return a directory named ``{tmp}/{name}_{fingerprint}`` whose
    contents were produced by ``build(scratch_dir)`` exactly once.

    ``build`` runs against a private scratch dir which is atomically
    renamed into the final path on success; a completed stage is marked by
    ``_STAGED_OK`` written BEFORE the rename (so the marker can never be
    observed on a partial directory)."""
    base = os.path.join(tempfile.gettempdir(), f"{name}_{fingerprint}")
    marker = os.path.join(base, "_STAGED_OK")
    if os.path.exists(marker):
        return base

    scratch = tempfile.mkdtemp(prefix=f".{name}.", dir=tempfile.gettempdir())
    try:
        build(scratch)
        open(os.path.join(scratch, "_STAGED_OK"), "w").close()
        for _ in range(3):
            try:
                os.rename(scratch, base)
                break
            except OSError:
                if os.path.exists(marker):
                    break  # a concurrent stager finished first; ours is redundant
                # base exists but was never completed (legacy or crashed
                # run): move it aside and retry the install
                stale = tempfile.mkdtemp(prefix=".stale.", dir=tempfile.gettempdir())
                try:
                    os.rename(base, os.path.join(stale, "old"))
                except OSError:
                    pass  # someone else already moved it; retry
                shutil.rmtree(stale, ignore_errors=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return base
