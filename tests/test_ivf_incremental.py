"""Incremental IVF index maintenance (VERDICT r7 #8): append batches
fold into the persisted index without a full rebuild — new vectors are
assigned to the EXISTING centroids and published as hardlinked base
files + one delta file; a full Lloyd rebuild happens only when appended
volume exceeds IVF_REBUILD_FRACTION of the built corpus (centroid
drift).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from restaurant_etl_spark.operators import similarity as sim
from restaurant_etl_spark.operators.similarity import (
    TOP_K,
    _ivf_probe_topk,
    ivf_append_batch,
    ivf_index_path,
    ivf_read_index,
)


@pytest.fixture()
def index_cache(tmp_path, monkeypatch):
    monkeypatch.setenv(sim._IVF_INDEX_ENV, str(tmp_path / "cache"))
    return str(tmp_path / "cache")


def _corpus(spark, sf_dir):
    return sim._emb(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))


def _twin_batch(spark, sf_dir, frac_mod: int, offset: int = 5_000_000):
    """Append batch: exact copies of every ``vec_id % frac_mod == 0``
    corpus vector under fresh ids — each appended twin has cosine 1.0
    with its original, so the serve path MUST find it (deterministic
    recall assertion, independent of the isotropic-corpus floors)."""
    return (
        _corpus(spark, sf_dir)
        .filter(F.col("vec_id") % frac_mod == 0)
        .select((F.col("vec_id") + offset).alias("vec_id"), "v")
    )


def test_append_reuses_centroids_no_rebuild(spark, sf_dir, index_cache, monkeypatch):
    base = ivf_index_path(spark, sf_dir)
    assert base is not None and os.path.isdir(base)
    cent_before = sorted(
        (r["c_cell"], tuple(r["cv"])) for r in ivf_read_index(spark, base)[0].collect()
    )
    base_inverted_files = sorted(os.listdir(os.path.join(base, "inverted")))
    n_base = spark.read.parquet(os.path.join(base, "inverted")).count()

    # a small batch (< IVF_REBUILD_FRACTION of corpus) must NOT rebuild —
    # trip a flag if the Lloyd build path runs at all
    def _boom(*a, **k):
        raise AssertionError("full rebuild ran for a small append batch")

    monkeypatch.setattr(sim, "_ivf_build_from", _boom)
    batch = _twin_batch(spark, sf_dir, frac_mod=20)  # 5% of corpus
    n_batch = batch.count()
    assert 0 < n_batch < sim.IVF_REBUILD_FRACTION * n_base
    new_dir, rebuilt = ivf_append_batch(spark, base, batch, tag="b1")
    monkeypatch.undo()

    assert rebuilt is False
    cent_after, inv_after = ivf_read_index(spark, new_dir)
    assert sorted(
        (r["c_cell"], tuple(r["cv"])) for r in cent_after.collect()
    ) == cent_before, "append must serve the EXISTING centroids"
    assert inv_after.count() == n_base + n_batch
    # base artifact is untouched and still serves its corpus version
    assert sorted(os.listdir(os.path.join(base, "inverted"))) == base_inverted_files
    assert spark.read.parquet(os.path.join(base, "inverted")).count() == n_base
    # append wrote O(batch): every base file is hardlinked, plus delta file(s)
    linked = [
        f for f in os.listdir(os.path.join(new_dir, "inverted"))
        if f in set(base_inverted_files)
    ]
    assert linked, "base inverted files should be reused (hardlink/copy)"

    # idempotent maintenance: same tag returns the same artifact
    again, rebuilt2 = ivf_append_batch(spark, base, batch, tag="b1")
    assert again == new_dir and rebuilt2 is False


def test_appended_vectors_are_served(spark, sf_dir, index_cache):
    """Recall on the appended data: querying with the ORIGINAL of each
    appended twin must surface the twin (cos = 1.0 → top-ranked within
    its probed cell, which is the query's own nearest cell)."""
    base = ivf_index_path(spark, sf_dir)
    batch = _twin_batch(spark, sf_dir, frac_mod=20)
    new_dir, _ = ivf_append_batch(spark, base, batch, tag="serve")
    cent, assign = ivf_read_index(spark, new_dir)

    q = (
        _corpus(spark, sf_dir)
        .filter(F.col("vec_id") % 20 == 0)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    )
    hits = _ivf_probe_topk(q, cent, assign).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in hits:
        by_q.setdefault(r["q_id"], {})[r["vec_id"]] = r["rn"]
    n_q = q.count()
    assert len(by_q) == n_q
    found = sum(1 for qid, h in by_q.items() if qid + 5_000_000 in h)
    assert found == n_q, (
        f"only {found}/{n_q} appended twins served — appended vectors "
        f"not reachable through the index"
    )
    # and the twin is the TOP hit (cos 1.0 beats every isotropic neighbor)
    top1 = sum(1 for qid, h in by_q.items() if h.get(qid + 5_000_000) == 1)
    assert top1 == n_q


def test_existing_recall_floor_still_holds_after_append(spark, sf_dir, index_cache):
    """The pre-append corpus's recall must not degrade: appended twins
    can only displace ranks below their cos-1.0 hit, so recall@10 of the
    original neighbors stays within one displaced slot of the base
    index's recall."""
    from restaurant_etl_spark.operators.similarity import similarity_topk_cosine

    base = ivf_index_path(spark, sf_dir)
    cent_b, assign_b = ivf_read_index(spark, base)
    q = (
        _corpus(spark, sf_dir)
        .filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < sim.QUERY_ID_CAP))
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    )

    def recall_of(cent, assign):
        true: dict[int, set[int]] = {}
        for r in similarity_topk_cosine(spark, sf_dir).collect():
            true.setdefault(r["q_id"], set()).add(r["vec_id"])
        found: dict[int, set[int]] = {}
        for r in _ivf_probe_topk(q, cent, assign).collect():
            found.setdefault(r["q_id"], set()).add(r["vec_id"])
        per_q = [len(found.get(k, set()) & t) / len(t) for k, t in true.items()]
        return sum(per_q) / len(per_q)

    r_base = recall_of(cent_b, assign_b)
    batch = _twin_batch(spark, sf_dir, frac_mod=20)
    new_dir, _ = ivf_append_batch(spark, base, batch, tag="floor")
    r_after = recall_of(*ivf_read_index(spark, new_dir))
    # each query gains at most one cos-1.0 twin in its top-10, displacing
    # at most one true neighbor: allow exactly that one-slot budget
    assert r_after >= r_base - 1.0 / TOP_K - 1e-9, (
        f"recall degraded beyond the one-displaced-slot budget: "
        f"{r_base:.3f} -> {r_after:.3f}"
    )


def test_large_append_triggers_rebuild(spark, sf_dir, index_cache):
    base = ivf_index_path(spark, sf_dir)
    cent_before = {r["c_cell"] for r in ivf_read_index(spark, base)[0].collect()}
    n_base = spark.read.parquet(os.path.join(base, "inverted")).count()
    # 50% of the corpus > IVF_REBUILD_FRACTION → drift rebuild
    batch = _twin_batch(spark, sf_dir, frac_mod=2)
    n_batch = batch.count()
    assert n_batch > sim.IVF_REBUILD_FRACTION * n_base
    new_dir, rebuilt = ivf_append_batch(spark, base, batch, tag="big")
    assert rebuilt is True
    cent_after, inv_after = ivf_read_index(spark, new_dir)
    assert inv_after.count() == n_base + n_batch
    # the rebuild re-seeded over the grown corpus: √n grew, and appended
    # ids are eligible seeds — the centroid SET must differ
    assert {r["c_cell"] for r in cent_after.collect()} != cent_before
    meta = sim._read_ivf_meta(new_dir)
    assert meta["built_rows"] == meta["rows"] == n_base + n_batch


def test_chained_appends_accumulate_toward_rebuild(spark, sf_dir, index_cache):
    """built_rows carries across chained appends: two 20% batches cross
    the 30% threshold on the SECOND append."""
    base = ivf_index_path(spark, sf_dir)
    b1 = _twin_batch(spark, sf_dir, frac_mod=5, offset=5_000_000)   # 20%
    d1, r1 = ivf_append_batch(spark, base, b1, tag="c1")
    assert r1 is False
    b2 = _twin_batch(spark, sf_dir, frac_mod=5, offset=6_000_000)   # 20% more
    d2, r2 = ivf_append_batch(spark, d1, b2, tag="c2")
    assert r2 is True, "cumulative appended fraction must trigger the rebuild"
    meta = sim._read_ivf_meta(d2)
    assert meta["built_rows"] == meta["rows"]


# ---------------------------------------------------------------------------
# Promotion race contract (VERDICT r8 #6): the atomic-rename promotion gets
# the same two-writer + reader-mid-promotion proof the CDC compaction ledger
# has (tests/test_streaming_cdc.py). Writers stage in per-CALL private dirs
# (pid+uuid — pid alone let same-process writers share ONE staging dir and
# promote a torn mix); the only shared step is os.rename, so the loser gets
# ENOTEMPTY and serves the winner's artifact, and a reader polling the final
# path sees it fully formed or not at all.
# ---------------------------------------------------------------------------


def test_two_writer_append_race_single_winner(spark, sf_dir, index_cache, monkeypatch):
    import threading

    base = ivf_index_path(spark, sf_dir)
    n_base = spark.read.parquet(os.path.join(base, "inverted")).count()
    batch = _twin_batch(spark, sf_dir, frac_mod=20)
    n_batch = batch.count()
    expected_dir = f"{base}+race"

    a_staged = threading.Event()
    b_done = threading.Event()
    first_call = threading.Event()  # pause ONLY writer A's meta write
    real_meta = sim._write_ivf_meta

    def pausing_meta(tmp, meta):
        real_meta(tmp, meta)
        if not first_call.is_set():
            first_call.set()
            a_staged.set()          # A fully staged, one os.rename from done
            assert b_done.wait(300), "writer B never finished"

    monkeypatch.setattr(sim, "_write_ivf_meta", pausing_meta)
    result_a: dict = {}

    def writer_a():
        result_a["dir"], result_a["rebuilt"] = ivf_append_batch(
            spark, base, batch, tag="race"
        )

    ta = threading.Thread(target=writer_a)
    ta.start()
    assert a_staged.wait(300), "writer A never staged its build"
    # reader mid-promotion: A's artifact is complete in its PRIVATE dir but
    # the served path must not exist yet — readers see old-or-complete only
    assert not os.path.exists(expected_dir)
    staging = [d for d in os.listdir(os.path.dirname(base)) if ".build." in d]
    assert staging, "A's staging dir should exist while paused"

    # writer B races the same tag to completion while A is paused
    dir_b, rebuilt_b = ivf_append_batch(spark, base, batch, tag="race")
    assert dir_b == expected_dir and os.path.isdir(dir_b)
    b_done.set()
    ta.join(300)
    assert not ta.is_alive()
    monkeypatch.undo()

    # single winner: both callers serve the SAME promoted artifact
    assert result_a["dir"] == dir_b == expected_dir
    # no torn index: exactly base + one batch (a shared staging dir would
    # have accumulated BOTH writers' delta files)
    assert spark.read.parquet(os.path.join(dir_b, "inverted")).count() == n_base + n_batch
    # loser's staging dir was cleaned up — nothing half-promoted remains
    leftovers = [d for d in os.listdir(os.path.dirname(base)) if ".build." in d]
    assert leftovers == [], f"staging leftovers: {leftovers}"
    # the artifact serves: appended twins reachable at cos 1.0
    cent, assign = ivf_read_index(spark, dir_b)
    q = (
        _corpus(spark, sf_dir)
        .filter(F.col("vec_id") % 20 == 0)
        .limit(5)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    )
    hits = _ivf_probe_topk(q, cent, assign).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert all(qid + 5_000_000 in vs for qid, vs in by_q.items())


def test_concurrent_distinct_tag_appends_are_independent(spark, sf_dir, index_cache):
    """Two maintenance jobs appending DIFFERENT batches under different
    tags off the same base publish two independent artifacts — neither
    sees the other's delta (per-call staging, immutable base)."""
    import threading

    base = ivf_index_path(spark, sf_dir)
    n_base = spark.read.parquet(os.path.join(base, "inverted")).count()
    b1 = _twin_batch(spark, sf_dir, frac_mod=20, offset=5_000_000)
    b2 = _twin_batch(spark, sf_dir, frac_mod=25, offset=6_000_000)
    n1, n2 = b1.count(), b2.count()
    out: dict = {}

    def run(tag, batch, key):
        out[key] = ivf_append_batch(spark, base, batch, tag=tag)[0]

    t1 = threading.Thread(target=run, args=("t1", b1, "d1"))
    t2 = threading.Thread(target=run, args=("t2", b2, "d2"))
    t1.start(); t2.start(); t1.join(300); t2.join(300)
    assert not t1.is_alive() and not t2.is_alive()
    assert out["d1"] != out["d2"]
    assert spark.read.parquet(os.path.join(out["d1"], "inverted")).count() == n_base + n1
    assert spark.read.parquet(os.path.join(out["d2"], "inverted")).count() == n_base + n2
    # base untouched
    assert spark.read.parquet(os.path.join(base, "inverted")).count() == n_base
    leftovers = [d for d in os.listdir(os.path.dirname(base)) if ".build." in d]
    assert leftovers == []
