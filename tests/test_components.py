"""Transitive-closure semantics of dedup_components: a chain A~B~C where
A and C are NOT directly near-dups must still collapse into one cluster —
exactly what one-hop canonicalization (dedup_simhash_keep) cannot do."""

from __future__ import annotations

import os

from restaurant_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _exact_jaccard_pairs,
    dedup_components,
    shingle_table,
)


def _chain_docs(spark, tmp_path):
    """Three 30-token docs: B differs from A at interior position 10, C
    differs from B at interior position 20. An interior token sits in 3
    shingles, so A~B = B~C = 25/31 ≈ 0.806 (≥ 0.8) while A~C loses both
    edits: 22/34 ≈ 0.647 (< 0.8) — a transitive chain, not a clique."""
    base = [f"w{i}" for i in range(30)]
    a = list(base)
    b = list(base)
    b[10] = "xmid"
    c = list(b)
    c[20] = "ymid"
    rows = [(i, " ".join(t)) for i, t in enumerate([a, b, c])]
    # a fourth, unrelated doc stays a singleton
    rows.append((3, " ".join(f"z{i}" for i in range(30))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_chain_collapses_to_one_component(spark, tmp_path):
    sf_dir = _chain_docs(spark, tmp_path)

    pairs = {
        (r.doc_a, r.doc_b)
        for r in _exact_jaccard_pairs(
            shingle_table(spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))),
            JACCARD_THRESHOLD,
        ).collect()
    }
    # the planted geometry really is a chain
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) not in pairs

    comp = {r.doc_id: r for r in dedup_components(spark, sf_dir).collect()}
    assert comp[0].component_id == comp[1].component_id == comp[2].component_id == 0
    assert comp[0].cluster_size == 3
    assert comp[0].is_canonical and not comp[1].is_canonical
    # the unrelated doc is its own singleton component
    assert comp[3].component_id == 3 and comp[3].cluster_size == 1
