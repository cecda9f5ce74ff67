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
    # ADVICE r14: the floor branch fires only when the scan has fewer
    # partitions than BOTH `want` and the host's core count, and Spark's
    # split sizing (min(maxPartitionBytes, max(openCost, bytes/cores)))
    # gives this one-file fixture 2-3 splits on its own — on a ≤3-core
    # box that ties the branch to the host. Pin the regime instead of
    # the host: a one-shot openCostInBytes bump makes the scan exactly
    # ONE partition, so 1 < want and 1 < cores hold on any box with ≥2
    # cores and the floor deterministically fires.
    open_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    try:
        e = sim._emb(spark, big)
        raw = spark.read.parquet(f"{big}/embeddings.parquet")
        assert raw.rdd.getNumPartitions() == 1, "fixture must be a 1-split scan"
        want = min(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            -(-n // sim._EMB_SCAN_CHUNK),
        )
        assert e.rdd.getNumPartitions() == want > 1
        assert e.count() == n  # the shuffle is a pure redistribution
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", open_cost)


# ---------------------------------------------------------------------------
# Grid-quantized float fingerprinting (VERDICT r9 #3): float/double/decimal
# columns are quantized floor(x·10^dp + 0.5) → BIGINT with the same
# IEEE-double ops in both engines, unlocking in-engine scale verification
# for score-carrying pair lists whose outputs explode with n.
# ---------------------------------------------------------------------------


def test_fingerprint_grid_matches_on_float_query(spark, duck, sf_dir):
    sdf = load_all()["dedup_ngram_jaccard"].fn(spark, sf_dir)
    assert any(
        f.dataType.simpleString() == "double" for f in sdf.schema.fields
    ), "fixture query must carry a float column"
    s_fp = _fingerprint_spark(sdf, dp=6)
    d_fp = _fingerprint_duck(
        duck, _oracle("dedup_ngram_jaccard"), sdf.columns,
        grid_cols=["jaccard"], dp=6,
    )
    assert s_fp[:3] == d_fp[:3]
    assert s_fp[0] > 0
    # jaccard is pre-rounded to 4dp, so on the 6dp grid every scaled value
    # sits ~half a grid cell from the floor boundary — comfortably outside
    # any FP slack. Cross-engine margins agree to FP noise.
    assert s_fp[3] is not None and s_fp[3] > 0.4
    assert d_fp[3] is not None and abs(s_fp[3] - d_fp[3]) < 1e-6


def test_fingerprint_grid_catches_float_change(duck):
    base = "SELECT i, CAST(i AS DOUBLE) / 7 AS v FROM range(100) t(i)"
    mutated = (
        "SELECT i, CASE WHEN i = 41 THEN v + 0.001 ELSE v END AS v "
        f"FROM ({base}) t"
    )
    a = _fingerprint_duck(duck, base, ["i", "v"], grid_cols=["v"], dp=6)
    b = _fingerprint_duck(duck, mutated, ["i", "v"], grid_cols=["v"], dp=6)
    assert a[0] == b[0]  # counts agree — count alone would miss it
    assert a[1] != b[1] and a[2] != b[2]


def test_fingerprint_grid_sub_grid_change_is_invisible_by_design(duck):
    """The grid compare claims equality AT dp, nothing finer: a 1e-9
    perturbation on a 6dp grid must NOT change the fingerprint (this is
    the declared-precision contract, not a miss)."""
    base = "SELECT i, 0.25 + CAST(i AS DOUBLE) / 1000 AS v FROM range(50) t(i)"
    nudged = f"SELECT i, v + 1e-9 AS v FROM ({base}) t"
    a = _fingerprint_duck(duck, base, ["i", "v"], grid_cols=["v"], dp=6)
    b = _fingerprint_duck(duck, nudged, ["i", "v"], grid_cols=["v"], dp=6)
    assert a[:3] == b[:3]


def test_fingerprint_grid_margin_flags_boundary_values(duck):
    """A value sitting exactly on a floor boundary of the grid must
    surface as a ~zero margin so the caller's slack guard can refuse
    (or pass-with-annotation when both engines agree bit-exactly)."""
    fp = _fingerprint_duck(
        duck,
        "SELECT 0.0000005::DOUBLE AS v",  # v*1e6 + 0.5 = 1.0 exactly
        ["v"], grid_cols=["v"], dp=6,
    )
    assert fp[3] is not None and fp[3] < 1e-9


def test_fingerprint_grid_half_up_identical_across_engines(spark, duck):
    """Negative values and .5-adjacent values quantize identically in
    both engines (floor(x·s + 0.5) is the same double arithmetic)."""
    vals = [-1.2345675, -0.5, -1e-7, 0.0, 1e-7, 0.4999995, 2.7182818]
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double"
    )
    s_fp = _fingerprint_spark(sdf, dp=6)
    duck_vals = ", ".join(f"({i}, {v!r}::DOUBLE)" for i, v in enumerate(vals))
    d_fp = _fingerprint_duck(
        duck,
        f"SELECT CAST(i AS INTEGER) AS i, v FROM (VALUES {duck_vals}) t(i, v)",
        ["i", "v"], grid_cols=["v"], dp=6,
    )
    assert s_fp[:3] == d_fp[:3]


def test_fingerprint_grid_null_floats_canonicalize(duck):
    a = _fingerprint_duck(
        duck, "SELECT 1 AS i, NULL::DOUBLE AS v", ["i", "v"],
        grid_cols=["v"], dp=6,
    )
    b = _fingerprint_duck(
        duck, "SELECT 1 AS i, 0.5::DOUBLE AS v", ["i", "v"],
        grid_cols=["v"], dp=6,
    )
    assert a[0] == b[0] == 1
    assert a[1] != b[1]  # NULL and 500000 canonicalize differently
    assert a[3] is None  # margin ignores NULL rows entirely

def test_fingerprint_grid_off_lattice_counts(spark, duck):
    """ADVICE r10: a tiny margin earns the deterministic annotation only
    when the scaled value is integral within ulps (exact-lattice). A
    value 1e-12 past a boundary — far above ulp noise, inside the 1e-9
    slack — must count as OFF-lattice in both engines so the caller
    refuses instead of annotating a coincidence."""
    on = 0.0000005                   # y = v*1e6 + 0.5 = 1.0 exactly
    off = (1.0 + 1e-10 - 0.5) / 1e6  # y = 1.0 + ~1e-10: in-slack, off-grid
    s_on = _fingerprint_spark(
        spark.createDataFrame([(on,)], "v double"), dp=6)
    s_off = _fingerprint_spark(
        spark.createDataFrame([(off,)], "v double"), dp=6)
    assert s_on[4] == 0 and s_on[3] < 1e-9
    assert s_off[4] == 1 and s_off[3] < 1e-9
    d_on = _fingerprint_duck(
        duck, f"SELECT {on!r}::DOUBLE AS v", ["v"], grid_cols=["v"], dp=6)
    d_off = _fingerprint_duck(
        duck, f"SELECT {off!r}::DOUBLE AS v", ["v"], grid_cols=["v"], dp=6)
    assert d_on[4] == 0 and d_off[4] == 1


def test_fingerprint_timestamp_and_date_columns(spark, duck):
    """r13: timestamp/date columns fingerprint as exact integers (epoch
    micros / days-since-epoch) — no format-string parity to trust — and
    the two engines agree on a matching row and disagree on a changed
    one."""
    from scripts.check_oracle import _fp_time_cols

    sdf = spark.sql(
        "SELECT TIMESTAMP '2024-03-01 12:34:56.789' AS ts, "
        "DATE '2024-03-01' AS d, 7 AS k"
    )
    tc = _fp_time_cols(sdf.schema.fields)
    assert tc == {"ts": "timestamp", "d": "date"}
    s = _fingerprint_spark(sdf)
    d = _fingerprint_duck(
        duck,
        "SELECT TIMESTAMP '2024-03-01 12:34:56.789' AS ts, "
        "DATE '2024-03-01' AS d, 7 AS k",
        ["ts", "d", "k"], time_cols=tc,
    )
    assert (s[0], s[1], s[2]) == (d[0], d[1], d[2])
    d2 = _fingerprint_duck(
        duck,
        "SELECT TIMESTAMP '2024-03-01 12:34:56.790' AS ts, "
        "DATE '2024-03-01' AS d, 7 AS k",
        ["ts", "d", "k"], time_cols=tc,
    )
    assert (s[1], s[2]) != (d2[1], d2[2])
