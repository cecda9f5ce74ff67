"""The in-engine fingerprint compare mode (VERDICT r8 #2): queries whose
result sets are too large to collect (dedup_simhash emits ~105M pair rows
at sf10) are verified by COUNT + two order-insensitive 60-bit md5 hash
sums computed INSIDE each engine — only three scalars cross the driver.

These tests pin the mode's contract: (a) it agrees with the collect-path
full hash compare on a real query, (b) a single changed value with an
UNCHANGED row count is caught, (c) row-order permutations are invisible
(order-insensitivity), and (d) non-integer/string/boolean columns are
refused loudly instead of fingerprinted wrong.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from check_oracle import _fingerprint_duck, _fingerprint_spark  # noqa: E402

from restaurant_etl_spark.operators.registry import load_all  # noqa: E402


def _oracle(name: str) -> str:
    return load_all()[name].oracle


def test_fingerprint_matches_on_green_query(spark, duck, sf_dir):
    sdf = load_all()["dedup_simhash"].fn(spark, sf_dir)
    s_fp = _fingerprint_spark(sdf)
    d_fp = _fingerprint_duck(duck, _oracle("dedup_simhash"), sdf.columns)
    assert s_fp == d_fp
    assert s_fp[0] > 0  # non-degenerate: the corpus does have near-dup pairs


def test_fingerprint_catches_single_value_change(spark, duck, sf_dir):
    """One hamming value bumped by 1 on one pair: row count unchanged,
    both hash sums must move."""
    sdf = load_all()["dedup_simhash"].fn(spark, sf_dir)
    s_fp = _fingerprint_spark(sdf)
    base = _oracle("dedup_simhash")
    mutated = (
        "SELECT doc_a, doc_b, CASE WHEN doc_a = "
        f"(SELECT min(doc_a) FROM ({base}) m) THEN hamming + 1 "
        f"ELSE hamming END AS hamming FROM ({base}) t"
    )
    d_fp = _fingerprint_duck(duck, mutated, sdf.columns)
    assert s_fp[0] == d_fp[0]  # counts agree — count alone would miss it
    assert s_fp[1] != d_fp[1]
    assert s_fp[2] != d_fp[2]


def test_fingerprint_is_order_insensitive(duck):
    a = _fingerprint_duck(
        duck, "SELECT * FROM (VALUES (1, 'x'), (2, 'y'), (3, 'z')) t(i, s)", ["i", "s"]
    )
    b = _fingerprint_duck(
        duck, "SELECT * FROM (VALUES (3, 'z'), (1, 'x'), (2, 'y')) t(i, s)", ["i", "s"]
    )
    assert a == b


def test_fingerprint_refuses_float_columns(spark):
    df = spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS d")
    with pytest.raises(TypeError, match="fingerprint mode"):
        _fingerprint_spark(df)


# ---------------------------------------------------------------------------
# Scan-parallelism floor (r9 sf1→sf10 sweep finding): a single-row-group
# parquet corpus is unsplittable, so without the floor every O(q·n) scoring
# stage inherits ONE partition regardless of spark.sql.files.maxPartitionBytes.
# ---------------------------------------------------------------------------


def test_emb_scan_floor_small_corpus_untouched(spark, sf_dir):
    """Below the chunk size the plan must be byte-identical to the raw
    scan — no repartition, no extra shuffle at the committed SFs."""
    from restaurant_etl_spark.operators import similarity as sim

    e = sim._emb(spark, sf_dir)  # sf0.001: 500 rows < _EMB_SCAN_CHUNK
    assert "Exchange" not in e._jdf.queryExecution().executedPlan().toString()


def test_emb_scan_floor_spreads_single_file_corpus(spark, tmp_path):
    from pyspark.sql import functions as F

    from restaurant_etl_spark.operators import similarity as sim

    big = str(tmp_path / "corpus")
    n = 3 * sim._EMB_SCAN_CHUNK + 1
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {sim.DIM}), "
                "i -> CAST(pmod(id * i, 97) / 97.0 AS FLOAT))"
            ).alias("embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{big}/embeddings.parquet")
    )
    e = sim._emb(spark, big)
    raw = spark.read.parquet(f"{big}/embeddings.parquet")
    assert raw.rdd.getNumPartitions() < 4, "fixture must be a single-file scan"
    want = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        -(-n // sim._EMB_SCAN_CHUNK),
    )
    assert e.rdd.getNumPartitions() == want > 1
    assert e.count() == n  # the shuffle is a pure redistribution
