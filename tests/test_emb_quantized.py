"""The int8-quantized verify stage of the embedding keep-list (VERDICT
r12 #4): the integer prefilter must be provably LOSSLESS — the exact
float re-check on its survivors returns the byte-identical dup set the
all-float verify returns — and the analytic quantized-cosine slack
_Q_EPS must actually bound the quantization error."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.similarity import (
    _Q_EPS,
    _adaptive_cand,
    _dot,
    _dvec,
    _quantized_dup_pairs,
)


def test_quantized_dup_pairs_match_float_verify(spark, sf_dir):
    """End-to-end losslessness on a real corpus: the quantized pipeline's
    verified pair set equals the all-float pipeline's, row for row."""
    _e, _n, _w, dup_q = _quantized_dup_pairs(spark, sf_dir, tau=0.3)
    _e2, _n2, _w2, cand = _adaptive_cand(spark, sf_dir)
    dup_f = cand.filter(
        _dot(_dvec("va"), _dvec("vb")) / (F.col("na") * F.col("nb")) >= 0.3
    ).select("id_a", "id_b")
    q = {(r.id_a, r.id_b) for r in dup_q.collect()}
    f = {(r.id_a, r.id_b) for r in dup_f.collect()}
    assert q == f, f"quantized-only: {q - f}; float-only: {f - q}"
    assert q, "corpus fixture has no near-dups — test is vacuous"


def test_q_eps_bounds_quantization_error():
    """|cos(q_a, q_b) − cos(u_a, u_b)| ≤ _Q_EPS on adversarially varied
    random vectors (uniform sphere, near-parallel, near-threshold)."""
    rng = np.random.default_rng(1337)
    worst = 0.0
    for _ in range(2000):
        a = rng.standard_normal(64)
        mode = rng.integers(3)
        if mode == 0:
            b = rng.standard_normal(64)
        elif mode == 1:  # near-parallel (the keep-list's target regime)
            b = a + 0.05 * rng.standard_normal(64)
        else:  # engineered near the 0.3 threshold
            c = rng.standard_normal(64)
            c -= (c @ a) / (a @ a) * a
            b = 0.3 * a / np.linalg.norm(a) + np.sqrt(1 - 0.09) * c / np.linalg.norm(c)
        ua, ub = a / np.linalg.norm(a), b / np.linalg.norm(b)
        qa, qb = np.round(127 * ua), np.round(127 * ub)
        cos_t = float(ua @ ub)
        cos_q = float(qa @ qb) / (np.linalg.norm(qa) * np.linalg.norm(qb))
        worst = max(worst, abs(cos_q - cos_t))
    assert worst <= _Q_EPS, f"measured error {worst} exceeds bound {_Q_EPS}"


def test_q_eps_is_tight_enough_to_prune():
    """The slack must stay far below the verify threshold — a bound near
    0.3 would pass everything and the prefilter would prune nothing."""
    assert 0.0 < _Q_EPS < 0.1


def test_quantization_handles_zero_vector(spark):
    """An all-zeros vector must quantize to zeros (try_divide NULL
    snapped), never an ANSI divide/cast error — its qdot with anything is
    0, under every integer threshold, so its pairs drop."""
    from restaurant_etl_spark.operators.similarity import _Q_EXPR

    df = (
        spark.createDataFrame([(1, [0.0] * 64), (2, [1.0] + [0.0] * 63)], "vec_id long, v array<float>")
        .withColumn("nrm", F.sqrt(F.aggregate(F.transform("v", lambda x: x.cast("double")), F.lit(0.0), lambda acc, x: acc + x * x)))
        .withColumn("q", F.expr(_Q_EXPR))
    )
    rows = {r.vec_id: r for r in df.collect()}
    assert all(x == 0 for x in rows[1].q)
    assert rows[2].q[0] == 127 and all(x == 0 for x in rows[2].q[1:])


def test_int_threshold_is_conservative():
    """The integer prefilter threshold must never exceed
    (tau − _Q_EPS)·‖qa‖‖qb‖ for any reachable norms, i.e. it uses the
    norm FLOOR — and the bound math pins to the constants."""
    from restaurant_etl_spark.operators.similarity import (
        _Q_NORM_LO,
        _q_int_threshold,
    )

    assert _Q_NORM_LO == 123.0
    thr = _q_int_threshold(0.3)
    assert thr <= (0.3 - _Q_EPS) * 123.0 * 123.0
    assert thr == 3554  # pinned: a silent constant change shows up here


def test_pair_count_closed_form_matches_distinct_join(spark, sf_dir):
    """The inclusion-exclusion band-group count must equal the
    materialized DISTINCT pair count exactly — same corpus, same width."""
    from restaurant_etl_spark.operators.similarity import (
        _adaptive_ids,
        _adaptive_pair_count,
    )

    _e, _n, _w, _s, ids = _adaptive_ids(spark, sf_dir)
    _e2, _n2, _w2, closed = _adaptive_pair_count(spark, sf_dir)
    assert closed == ids.count()
    assert closed > 0
