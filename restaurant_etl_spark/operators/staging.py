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
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_STAGED: dict[tuple, DataFrame] = {}


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


def staged(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    label: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the staged artifact ``label`` for ``table`` at ``sf_dir``,
    building + eagerly localCheckpointing it on first use in this
    process/context and reusing the checkpointed frame afterwards."""
    key = (
        spark.sparkContext.applicationId,
        table,
        table_fingerprint(sf_dir, table),
        label,
    )
    df = _STAGED.get(key)
    if df is None:
        df = build().localCheckpoint()
        _STAGED[key] = df
    return df


def clear_staged() -> None:
    """Drop every cache entry (tests; the checkpoint blocks themselves
    are released by the JVM once unreferenced)."""
    _STAGED.clear()
