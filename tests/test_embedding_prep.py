"""Math invariants of the embedding preprocessing battery (the oracle
checks cross-engine equality; these check the properties themselves)."""

from __future__ import annotations

import math

from restaurant_etl_spark.operators.embedding_prep import (
    embedding_l2_normalize,
    embedding_quantize_int8,
)
from restaurant_etl_spark.operators.dedup import dedup_simhash_keep


def test_normalized_vectors_are_unit(spark, sf_dir):
    rows = embedding_l2_normalize(spark, sf_dir).limit(20).collect()
    assert rows
    for r in rows:
        comps = [int(x) / 100000 for x in r.unit_vec_scaled.split(",")]
        assert len(comps) == 64
        # scaled-int serialization quantizes at 1e-5 per component
        assert abs(math.sqrt(sum(c * c for c in comps)) - 1.0) < 1e-3


def test_quantized_codes_fit_int8_and_reconstruct(spark, sf_dir):
    rows = embedding_quantize_int8(spark, sf_dir).limit(20).collect()
    assert rows
    for r in rows:
        codes = [int(x) for x in r.q8.split(",")]
        assert len(codes) == 64
        assert all(-127 <= c <= 127 for c in codes)
        # absmax scaling: at least one component saturates to ±127
        assert max(abs(c) for c in codes) == 127
        # mean per-component reconstruction error under half a quant step
        assert r.recon_err_l1 / 64 <= 0.5 / r.scale + 1e-9


def test_simhash_keep_canonicals_are_kept_and_minimal(spark, sf_dir):
    rows = dedup_simhash_keep(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in rows}
    assert rows
    for r in rows:
        # canonical is never a larger id, and a doc is kept iff it is its
        # own canonical
        assert r.canonical_id <= r.doc_id
        assert r.is_kept == (r.canonical_id == r.doc_id)
    # one-hop canonicalization (documented in the docstring): a canonical
    # may itself be dropped for a smaller id, but ids strictly decrease so
    # every chain terminates at a kept fixed point
    for r in rows:
        cur = r
        for _ in range(len(rows)):
            if cur.is_kept:
                break
            nxt = by_id[cur.canonical_id]
            assert nxt.doc_id < cur.doc_id
            cur = nxt
        assert cur.is_kept
