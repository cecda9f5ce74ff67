"""The embeddings data-contract check (_emb), post VERDICT r9 #7 + ADVICE r9.

Contract: every ``embedding`` is exactly DIM non-NULL floats and ``vec_id``
is unique — violations fail LOUDLY. What changed in r10 is the COST: for
corpora whose parquet footers carry statistics, the full-corpus pre-pass is
replaced by footer evidence (row counts, leaf null counts, PER-ROW-GROUP
element balance) plus a column-pruned vec_id uniqueness aggregate and an
exact-DIM spot check over row groups spread across all files (ADVICE r10:
the earlier LIMIT form read only the first partition). The cache is keyed on a file fingerprint (names +
sizes + mtimes), so an in-process rewrite under the same path revalidates
instead of serving a stale row count to the repartition floor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from restaurant_etl_spark.operators import similarity as sim


def _write_corpus(spark, path: str, n: int, dim: int | None = None):
    dim = dim or sim.DIM
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dim}), "
                "i -> CAST(pmod(id * i, 97) / 97.0 AS FLOAT))"
            ).alias("embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/embeddings.parquet")
    )


def test_footer_evidence_proves_clean_corpus(spark, tmp_path, sf_dir):
    _write_corpus(spark, str(tmp_path), 300)
    n, proven = sim._emb_footer_evidence(str(tmp_path))
    assert (n, proven) == (300, True)
    # the committed test corpora are footer-proven too — the fast path is
    # what every registered embedding query actually exercises
    n_sf, proven_sf = sim._emb_footer_evidence(sf_dir)
    assert proven_sf and n_sf > 0


def test_contract_cache_rekeys_on_rewrite(spark, tmp_path):
    """ADVICE r9: the bare-sf_dir cache let an in-process rewrite skip
    revalidation and mis-size the scan-parallelism floor."""
    p = str(tmp_path)
    _write_corpus(spark, p, 100)
    assert sim._emb(spark, p).count() == 100
    _write_corpus(spark, p, 2 * sim._EMB_SCAN_CHUNK)  # same path, new corpus
    e = sim._emb(spark, p)
    assert e.count() == 2 * sim._EMB_SCAN_CHUNK
    # the floor must be sized from the NEW n, not the stale cached 100
    assert e.rdd.getNumPartitions() == 2


def test_duplicate_vec_ids_fail_loudly_on_fast_path(spark, tmp_path):
    p = str(tmp_path)
    _write_corpus(spark, p, 50)
    dup = spark.read.parquet(f"{p}/embeddings.parquet")
    dup.union(dup.limit(1)).coalesce(1).write.mode("overwrite").parquet(
        f"{p}2/embeddings.parquet"
    )
    n, proven = sim._emb_footer_evidence(f"{p}2")
    assert proven  # footers can't see duplicates — the pruned scan must
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        sim._emb(spark, f"{p}2")


def test_wrong_dim_fails_loudly(spark, tmp_path):
    _write_corpus(spark, str(tmp_path), 50, dim=sim.DIM - 1)
    # every row is short, so footer element total != n*DIM → footer not
    # proven → legacy full scan path → loud failure
    n, proven = sim._emb_footer_evidence(str(tmp_path))
    assert not proven
    with pytest.raises(ValueError, match="not exactly DIM"):
        sim._emb(spark, str(tmp_path))


def test_null_element_defeats_footer_proof(spark, tmp_path):
    p = str(tmp_path)
    (
        spark.range(20)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {sim.DIM}), i -> CASE WHEN id = 7 "
                "AND i = 3 THEN CAST(NULL AS FLOAT) "
                "ELSE CAST(i AS FLOAT) END)"
            ).alias("embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{p}/embeddings.parquet")
    )
    n, proven = sim._emb_footer_evidence(p)
    assert not proven  # leaf null_count > 0 in the footer
    with pytest.raises(ValueError, match="non-NULL floats"):
        sim._emb(spark, p)


def test_compensating_lengths_caught_by_spot_check(spark, tmp_path):
    """63+65 balances the footer element total — the one violation footer
    stats cannot exclude when it sits inside a single row group. The
    spread spot check catches it up front (and downstream zip_with
    scoring NULLs loudly under the oracle gate otherwise)."""
    p = str(tmp_path)
    (
        spark.range(10)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, CASE WHEN id = 2 THEN "
                f"{sim.DIM - 1} WHEN id = 3 THEN {sim.DIM + 1} "
                f"ELSE {sim.DIM} END), i -> CAST(i AS FLOAT))"
            ).alias("embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{p}/embeddings.parquet")
    )
    n, proven = sim._emb_footer_evidence(p)
    assert proven  # 63 + 65 == 2*DIM: invisible to the footer
    with pytest.raises(ValueError, match="compensating length"):
        sim._emb(spark, p)

def _pa_corpus(path: str, files: dict[str, list[int]]):
    """Write an embeddings.parquet DIRECTORY with one parquet file per
    entry; each value is a list of per-row embedding lengths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"{path}/embeddings.parquet"
    os.makedirs(d, exist_ok=True)
    next_id = 0
    for fname, lengths in files.items():
        ids, vecs = [], []
        for ln in lengths:
            ids.append(next_id)
            vecs.append([float(i % 97) for i in range(ln)])
            next_id += 1
        t = pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "embedding": pa.array(vecs, pa.list_(pa.float32()))}
        )
        pq.write_table(t, os.path.join(d, fname))


def test_compensating_lengths_past_first_file_caught(spark, tmp_path):
    """ADVICE r10 (medium): e.limit() read only the first partition, so a
    corpus whose compensating errors sit in a LATER file passed the fast
    path. The spread sampler always includes the last row group."""
    p = str(tmp_path)
    d = sim.DIM
    _pa_corpus(p, {
        "a.parquet": [d] * 100,
        "b.parquet": [d] * 100,
        "c.parquet": [d - 1, d + 1] + [d] * 98,  # balanced within its rg
    })
    n, proven = sim._emb_footer_evidence(p)
    assert proven  # 63 + 65 == 2*DIM inside one row group: footer-invisible
    with pytest.raises(ValueError, match="compensating length"):
        sim._emb(spark, p)


def test_per_row_group_imbalance_defeats_footer_proof(spark, tmp_path):
    """A 63-length row in one row group compensated by a 65-length row in
    ANOTHER is now footer-visible: element counts must balance per row
    group, not just per corpus (ADVICE r10)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path)
    d = sim.DIM
    lengths = [d] * 50 + [d - 1] + [d] * 49 + [d] * 50 + [d + 1] + [d] * 49
    vecs = [[float(i % 97) for i in range(ln)] for ln in lengths]
    t = pa.table(
        {"vec_id": pa.array(range(len(lengths)), pa.int64()),
         "embedding": pa.array(vecs, pa.list_(pa.float32()))}
    )
    pq.write_table(t, f"{p}/embeddings.parquet", row_group_size=100)
    n, proven = sim._emb_footer_evidence(p)
    assert not proven  # each row group is off by one element
    with pytest.raises(ValueError, match="not exactly DIM"):
        sim._emb(spark, p)


def test_spot_check_spreads_across_files(tmp_path):
    p = str(tmp_path)
    _pa_corpus(p, {f"f{i}.parquet": [sim.DIM] * 40 for i in range(12)})
    checked, bad = sim._spot_check_dims(p)
    assert bad == 0
    # 12 row groups, sampler takes _EMB_SPOT_ROW_GROUPS spread ones
    # including first and last; each contributes up to budget/k rows
    assert checked >= sim._EMB_SPOT_ROW_GROUPS * 40 / 2


# ---------------------------------------------------------------------------
# r16: per-consumer scan-floor chunks (VERDICT r15 #1)
# ---------------------------------------------------------------------------


def test_scan_floor_chunk_is_per_consumer(spark, tmp_path):
    """The floor must be sized by the CALLER's downstream per-row cost:
    a 2000-row corpus (bench sf0.1 size) widens under the signature
    chunk but keeps its native single-partition scan under the map
    chunk — the r15 regression was the map consumers paying the
    signature floor's shuffle (driver: embedding_quantize_int8 −29%)."""
    p = str(tmp_path)
    _write_corpus(spark, p, 2000)
    sig = sim._emb(spark, p)  # default: signature chunk (1024)
    assert sig.rdd.getNumPartitions() == 2
    mapped = sim._emb(spark, p, chunk=sim._EMB_MAP_CHUNK)
    assert mapped.rdd.getNumPartitions() == 1


def test_score_chunk_tracks_query_count():
    """q×n scoring chunk shrinks with the broadcast query count and never
    drops below the signature chunk: ~20 queries (bench sf0.1) must NOT
    trip the floor on an n=2000 corpus (chunk > 2000), the capped
    128-query set must (chunk ~1.8k)."""
    assert sim._score_chunk(20) > 2000
    assert sim._EMB_SCAN_CHUNK <= sim._score_chunk(128) < 2000
    # degenerate inputs stay sane
    assert sim._score_chunk(0) >= sim._EMB_SCAN_CHUNK
    assert sim._score_chunk(10**9) == sim._EMB_SCAN_CHUNK
