"""In-process cache for eagerly staged (localCheckpointed) artifacts,
keyed on corpus identity (VERDICT r10 #7).

The cold ledger showed two-thirds of the per-call construction column at
sf10 concentrated in four queries (source-overlap matrix 67.8 s,
containment 68.9 s, incremental 33.9 s, pagerank 28.2 s) whose
construction EAGERLY localCheckpoints the same staging — the per-doc
shingle-array frame, the DF-capped common-count pairs, pagerank's
order-incidence loop invariant — once per query call, even when an
identical artifact was materialized seconds earlier by a sibling query
over the same corpus.

``staged`` keys each artifact on (SparkContext application id, table
file fingerprint, label) — the ``_EMB_CONTRACT_OK`` pattern from
similarity.py: the fingerprint is file names + sizes + mtimes, so an
in-process rewrite under the same path (the incremental-ingest pattern)
changes the key and forces a rebuild, and a stale frame can never be
served for new data. The context id scopes entries to the JVM that owns
the checkpoint blocks; entries from a stopped context are unreachable
garbage, never stale results.

Value safety: a cache hit returns the SAME rows the builder would have
produced (same files, same deterministic derivation), so every oracle
hash is unchanged by construction; the full registry was re-verified
green at sf0.01/sf0.1 when this landed.

Memory: entries are localCheckpoint blocks (MEMORY_AND_DISK) that the
pre-cache code created and dropped per call; keeping the handful of
per-corpus artifacts alive for the process bounds total footprint by
#corpora × #labels, a few GB at sf10 against the 48g big-SF driver.

Eviction (VERDICT r11 #2): a table rewrite changes the fingerprint, so
the old entry for the same (table, label) becomes unreachable — its
checkpoint blocks are explicitly unpersisted the moment the superseding
entry is built (``_release``), instead of staying pinned until JVM exit.
Entries keyed to a stopped SparkContext are dropped on every ``staged``
call (their blocks died with the context), so a long-lived process
cycling sessions or corpora holds at most the live context's live
fingerprints.

Corpus scoping (ADVICE r12): the cache key and the
unpersist-on-supersede match both include ``realpath(sf_dir)``. Two
corpora staging the same (table, label) from different directories are
distinct live entries — only a true rewrite (same directory, new
fingerprint) releases the predecessor's blocks. Without this, a process
alternating between sf_dirs would thrash the cache AND unpersist frames
a sibling still holds (localCheckpoint truncates lineage, so the holder
fails with a missing-block error instead of recomputing).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_STAGED: dict[tuple, DataFrame] = {}

# regression guard (VERDICT r11 #6): builds per (corpus dir, table,
# label) this process — a refactor that quietly stops sharing the staged
# artifact shows up here as a count > 1 per corpus, long before the sf10
# cold ledger would catch it. Reset by ``clear_staged`` (VERDICT r12 #7)
# so the dict is bounded by the live cache's corpora, not process history.
_BUILD_COUNTS: dict[tuple[str, str, str], int] = {}


def _table_files(sf_dir: str, table: str) -> list[str]:
    """Data files behind a table (single parquet file or a Spark-written
    directory of part files), sorted for a stable fingerprint."""
    p = os.path.join(os.path.realpath(sf_dir), f"{table}.parquet")
    if os.path.isdir(p):
        return sorted(
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.endswith(".parquet") or f.startswith("part-")
        )
    return [p] if os.path.exists(p) else []


def table_fingerprint(sf_dir: str, table: str) -> str:
    """Corpus-identity key: file names + sizes + mtimes."""
    parts = []
    for f in _table_files(sf_dir, table):
        st = os.stat(f)
        parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]


def _release(df: DataFrame) -> None:
    """Best-effort explicit unpersist of a staged frame's checkpoint
    blocks. ``localCheckpoint`` persists the physical RDD and returns a
    frame whose analyzed plan is a LogicalRDD over exactly that RDD, so
    unpersist it directly; if the internal shape ever moves, fall back to
    dropping the reference (Spark's ContextCleaner then releases the
    blocks on GC — correct, just later)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def staged(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    label: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the staged artifact ``label`` for ``table`` at ``sf_dir``,
    building + eagerly localCheckpointing it on first use in this
    process/context and reusing the checkpointed frame afterwards.

    Superseded entries (same table+label, older fingerprint) and entries
    owned by stopped contexts are evicted here, so the cache holds at
    most one live frame per (corpus, label)."""
    app_id = spark.sparkContext.applicationId
    # entries from a stopped context: blocks died with the JVM-side
    # context; drop the dead references so the dict stays bounded
    for k in [k for k in _STAGED if k[0] != app_id]:
        del _STAGED[k]
    sf_real = os.path.realpath(sf_dir)
    fp = table_fingerprint(sf_dir, table)
    key = (app_id, sf_real, table, fp, label)
    df = _STAGED.get(key)
    if df is None:
        # unpersist-on-supersede: a rewritten corpus under the SAME
        # directory changed the fingerprint — release the old frame's
        # checkpoint blocks now instead of pinning them until JVM exit.
        # Scoped to this sf_dir (ADVICE r12): other corpora's live
        # entries for the same (table, label) are left alone.
        for k in [
            k
            for k in _STAGED
            if k[0] == app_id
            and k[1] == sf_real
            and k[2] == table
            and k[4] == label
            and k[3] != fp
        ]:
            _release(_STAGED.pop(k))
        df = build().localCheckpoint()
        _STAGED[key] = df
        bk = (sf_real, table, label)
        _BUILD_COUNTS[bk] = _BUILD_COUNTS.get(bk, 0) + 1
    return df


def clear_staged() -> None:
    """Drop every cache entry, explicitly unpersisting each frame's
    checkpoint blocks, and reset the build-count guard (tests and
    long-lived sessions)."""
    while _STAGED:
        _release(_STAGED.popitem()[1])
    _BUILD_COUNTS.clear()
