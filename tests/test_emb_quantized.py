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
        qa, qb = np.round(32767 * ua), np.round(32767 * ub)
        cos_t = float(ua @ ub)
        cos_q = float(qa @ qb) / (np.linalg.norm(qa) * np.linalg.norm(qb))
        worst = max(worst, abs(cos_q - cos_t))
    assert worst <= _Q_EPS, f"measured error {worst} exceeds bound {_Q_EPS}"


def test_q_eps_is_tight_enough_to_prune():
    """The slack must stay FAR below the verify threshold — a bound near
    0.3 would pass everything and the prefilter would prune nothing. At
    the int16 scale it must also keep the float margin a rounding-edge
    audit, not a data path (the int8 lesson, see _Q_SCALE)."""
    assert 0.0 < _Q_EPS < 1e-3


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
    assert rows[2].q[0] == 32767 and all(x == 0 for x in rows[2].q[1:])


def test_int_threshold_is_conservative():
    """The integer prefilter threshold must never exceed
    (tau − _Q_EPS)·‖qa‖‖qb‖ for any reachable norms, i.e. it uses the
    norm FLOOR — and the bound math pins to the constants."""
    from restaurant_etl_spark.operators.similarity import (
        _Q_NORM_LO,
        _q_int_threshold,
    )

    assert _Q_NORM_LO == 32763.0
    thr = _q_int_threshold(0.3)
    assert thr <= (0.3 - _Q_EPS) * 32763.0 * 32763.0
    assert thr == 321762146  # pinned: a silent constant change shows up here


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


def test_hi_threshold_is_conservative():
    """The definite-dup threshold must never fall below
    (tau + _Q_EPS)·‖qa‖‖qb‖ for any reachable norms, i.e. it uses the
    norm CEILING — and the bound math pins to the constants."""
    from restaurant_etl_spark.operators.similarity import (
        _Q_NORM_HI,
        _q_int_threshold_hi,
    )

    assert _Q_NORM_HI == 32771.0
    thr = _q_int_threshold_hi(0.3)
    # STRICTLY above the exact bound (ADVICE r14 one-ulp cushion: a
    # boundary pair must land in the float-decided margin, not in
    # definite, so arm identity holds under double rounding too)
    assert thr > (0.3 + _Q_EPS) * 32771.0 * 32771.0
    assert thr == 322443766  # pinned: a silent constant change shows up here


def test_definite_implies_true_dup():
    """The upper bound itself, adversarially: any pair whose integer qdot
    reaches the hi threshold has TRUE cosine ≥ tau — across random,
    near-parallel and near-boundary ensembles (the proof's empirical
    twin; a violation here would mean the definite branch ships a false
    dup without ever checking floats)."""
    from restaurant_etl_spark.operators.similarity import _q_int_threshold_hi

    rng = np.random.default_rng(271828)
    thr = _q_int_threshold_hi(0.3)
    checked = 0
    for _ in range(4000):
        a = rng.standard_normal(64)
        mode = rng.integers(3)
        if mode == 0:
            b = rng.standard_normal(64)
        elif mode == 1:
            b = a + 0.05 * rng.standard_normal(64)
        else:  # engineered just above the certainty boundary
            c = rng.standard_normal(64)
            c -= (c @ a) / (a @ a) * a
            t = 0.3 + _Q_EPS + 0.01 * rng.random()
            b = t * a / np.linalg.norm(a) + np.sqrt(1 - t * t) * c / np.linalg.norm(c)
        ua, ub = a / np.linalg.norm(a), b / np.linalg.norm(b)
        qa, qb = np.round(32767 * ua), np.round(32767 * ub)
        if float(qa @ qb) >= thr:
            checked += 1
            assert float(ua @ ub) >= 0.3
    assert checked > 200, "ensemble never reached the definite region — vacuous"


# ---------------------------------------------------------------------------
# Adversarial MARGIN corpus: engineered pairs that share the full 64-bit
# hyperplane signature (guaranteed band collision at any width) with true
# cosine sitting just above / just below tau, so the two-sided bound's
# float-margin branch is actually exercised — plus a zero-norm vector
# whose NaN cosine the guard must keep out of the dup set (ADVICE r13).
# ---------------------------------------------------------------------------


def _np_f32(v):
    """The engine's value domain: parquet stores float32, both engines
    then widen to double."""
    return np.asarray(v, dtype=np.float32).astype(np.float64)


def _np_quant(v):
    """Replicate _Q_EXPR: round(S·x/‖v‖) HALF-UP (Spark round), clamped
    to ±S, zeros for the zero vector (S = _Q_SCALE = 32767)."""
    v = _np_f32(v)
    nrm = float(np.sqrt((v * v).sum()))
    if nrm == 0.0:
        return np.zeros_like(v)
    x = 32767.0 * v / nrm
    return np.clip(np.sign(x) * np.floor(np.abs(x) + 0.5), -32767.0, 32767.0)


def _np_cos(a, b):
    a, b = _np_f32(a), _np_f32(b)
    na, nb = np.sqrt((a * a).sum()), np.sqrt((b * b).sum())
    return float((a * b).sum() / (na * nb)) if na * nb > 0 else float("nan")


def _cone_setup(rng, H, Hinv):
    """A base vector a and a blend family vec(t) that stays inside a's
    signature cone {x : H·x = diag(s)·y, y > 0} for every t ∈ [0, 1] —
    collision in both bands is by construction, not luck — with cosine
    descending from 1 toward a low endpoint as t → 1."""
    while True:
        a = rng.standard_normal(64)
        ha = H @ a
        if (ha == 0).any():
            continue
        s, ya = np.sign(ha), np.abs(ha)
        yb = rng.random(64) + 1e-3

        def vec(t):
            return Hinv @ (s * ((1 - t) * ya + t * yb))

        if _np_cos(a, vec(1.0)) < 0.2:
            return a, vec


def _sig_preserved(H, a, b):
    """No hyperplane sign may flip once the vectors round-trip through
    float32 storage (the engine computes signatures on stored values)."""
    return (((H @ _np_f32(a)) > 0) == ((H @ _np_f32(b)) > 0)).all()


def _cone_pair_at_cos(rng, H, Hinv, target):
    """Colliding pair with float32 cosine ≈ target (coarse regime:
    prefilter rejects, far from any threshold edge)."""
    for _ in range(100):
        a, vec = _cone_setup(rng, H, Hinv)
        lo_t, hi_t = 0.0, 1.0
        for _ in range(60):
            mid = 0.5 * (lo_t + hi_t)
            if _np_cos(a, vec(mid)) > target:
                lo_t = mid
            else:
                hi_t = mid
        b = vec(0.5 * (lo_t + hi_t))
        if abs(_np_cos(a, b) - target) < 0.02 and _sig_preserved(H, a, b):
            return a, b
    raise AssertionError("cone construction failed to hit the target cosine")


def _cone_pair_in_margin(rng, H, Hinv, lo_q, hi_q, want_above):
    """Colliding pair whose integer qdot lands strictly inside the
    [lo_q, hi_q) margin — at the int16 scale a ~6.8e5-wide window in a
    ~6.9e10 range, so the search bisects the QDOT STEP FUNCTION itself
    (piecewise-constant in the blend parameter; single rounding flips
    move it ~3e4, far less than the window, so the plateau just under
    the hi threshold is inside the margin) — with float32 cosine on the
    requested side of 0.3."""
    # bisecting on the HI threshold converges to the window's top edge
    # (quantized cosine ≈ tau + eps, so true cosine sits just ABOVE tau);
    # bisecting on LO converges to the bottom edge (true cosine just
    # BELOW tau) — pick the edge matching the requested side.
    edge = hi_q if want_above else lo_q
    for _ in range(500):
        a, vec = _cone_setup(rng, H, Hinv)
        qa = _np_quant(a)

        def qd(t):
            return float(qa @ _np_quant(vec(t)))

        lo_t, hi_t = 0.0, 1.0
        if qd(0.0) < edge:
            continue
        for _ in range(80):
            mid = 0.5 * (lo_t + hi_t)
            if qd(mid) >= edge:
                lo_t = mid
            else:
                hi_t = mid
        for t in np.linspace(lo_t, hi_t, 64):
            b = vec(t)
            q = float(qa @ _np_quant(b))
            if not (lo_q <= q < hi_q):
                continue
            cos32 = _np_cos(a, b)
            side_ok = (cos32 >= 0.3) if want_above else (cos32 < 0.3)
            if side_ok and _sig_preserved(H, a, b):
                return a, b
    raise AssertionError("cone construction failed to land in the margin")


def test_two_sided_margin_end_to_end(spark, tmp_path):
    from restaurant_etl_spark.operators.similarity import (
        _adaptive_cand,
        _hyperplanes,
        _q_int_threshold,
        _q_int_threshold_hi,
    )

    H = np.array(_hyperplanes(64), dtype=np.float64)
    Hinv = np.linalg.inv(H)
    rng = np.random.default_rng(1234)
    lo_q, hi_q = _q_int_threshold(0.3), _q_int_threshold_hi(0.3)

    rows, pairs = [], {}
    next_id = 0

    def add_pair(kind, a, b):
        nonlocal next_id
        ia, ib = next_id, next_id + 1
        next_id += 2
        rows.append((ia, [float(x) for x in np.asarray(a, dtype=np.float32)]))
        rows.append((ib, [float(x) for x in np.asarray(b, dtype=np.float32)]))
        pairs.setdefault(kind, []).append((ia, ib))

    # margin pairs on both sides of tau (2 each), engineered to collide
    for _ in range(2):
        add_pair("margin_dup", *_cone_pair_in_margin(rng, H, Hinv, lo_q, hi_q, True))
        add_pair("margin_rej", *_cone_pair_in_margin(rng, H, Hinv, lo_q, hi_q, False))
    # a definite dup (near-parallel: integer-certain, no float check)
    a = rng.standard_normal(64)
    b = a + 0.02 * rng.standard_normal(64)
    assert float(_np_quant(a) @ _np_quant(b)) >= hi_q
    add_pair("definite", a, b)
    # a colliding pair the integer prefilter must drop outright
    add_pair("prefilter_rej", *_cone_pair_at_cos(rng, H, Hinv, 0.10))
    # the zero-norm NaN hole (ADVICE r13): the zero vector signs to the
    # all-zeros signature; w with H·w < 0 elementwise does too — they
    # collide, their float cosine is 0/0 = NaN, and NaN >= 0.3 is TRUE in
    # both engines, so only the explicit na·nb > 0 guard keeps them out.
    w = Hinv @ (-(rng.random(64) + 1e-3))
    assert not ((H @ _np_f32(w)) > 0).any()
    add_pair("zero_nan", np.zeros(64), w)
    # isotropic filler so the corpus isn't only engineered structure
    for _ in range(100):
        rows.append((next_id, [float(x) for x in rng.standard_normal(64).astype(np.float32)]))
        next_id += 1

    d = str(tmp_path / "margin_corpus")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(d + "/embeddings.parquet")

    _e, _n, _w, dup_q = _quantized_dup_pairs(spark, d, tau=0.3)
    got = {(r.id_a, r.id_b) for r in dup_q.collect()}

    # ground truth: the all-float verify, ANSI-safe (try_divide drops the
    # zero-norm pair exactly like the production margin verify does)
    _e2, _n2, _w2, cand = _adaptive_cand(spark, d)
    truth_df = cand.filter(
        F.try_divide(_dot(_dvec("va"), _dvec("vb")), F.col("na") * F.col("nb")) >= 0.3
    ).select("id_a", "id_b")
    truth = {(r.id_a, r.id_b) for r in truth_df.collect()}
    assert got == truth

    norm = lambda p: (min(p), max(p))
    for p in pairs["margin_dup"] + pairs["definite"]:
        assert norm(p) in got, f"true dup {p} missing"
    for p in pairs["margin_rej"] + pairs["prefilter_rej"] + pairs["zero_nan"]:
        assert norm(p) not in got, f"non-dup {p} leaked into the keep-list"

    # and the hole is REAL: without the guard, a bare float division on
    # the zero-norm pair is a DIVIDE_BY_ZERO crash under ANSI mode (the
    # r13 shape would have died mid-run at scale, not produced a wrong
    # row) — proving try_divide is what closes it, not luck
    import pytest

    unguarded = cand.filter(
        _dot(_dvec("va"), _dvec("vb")) / (F.col("na") * F.col("nb")) >= 0.3
    ).select("id_a", "id_b")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        unguarded.collect()


# ---------------------------------------------------------------------------
# Decade-adaptive verify-arm dispatch (r15, VERDICT r14 #2)
# ---------------------------------------------------------------------------


def test_verify_arm_switch_point():
    """The switch is pinned: float at or below EMB_VERIFY_FLOAT_MAX_N
    vectors (where O(n) float traffic is trivially affordable and the
    int16 constant buys nothing), int16 two-sided strictly above (where
    the float arm's O(n) shuffle is the r12/r13 disk wall)."""
    from restaurant_etl_spark.operators.similarity import (
        EMB_VERIFY_FLOAT_MAX_N,
        _verify_arm,
    )

    assert EMB_VERIFY_FLOAT_MAX_N == 1_000_000
    assert _verify_arm(2_000) == "float"
    assert _verify_arm(EMB_VERIFY_FLOAT_MAX_N) == "float"
    assert _verify_arm(EMB_VERIFY_FLOAT_MAX_N + 1) == "int16"
    assert _verify_arm(100_000_000) == "int16"


def test_keep_list_identical_on_both_sides_of_switch(spark, sf_dir, monkeypatch):
    """dedup_embedding_keep's output must be byte-identical whichever arm
    the dispatcher picks — forcing the int16 arm at the fixture's corpus
    size (by dropping the switch to 0) must reproduce the default float
    arm's keep-list row for row."""
    from restaurant_etl_spark.operators import similarity as sim

    keep_float = {
        tuple(r) for r in sim.dedup_embedding_keep(spark, sf_dir).collect()
    }
    monkeypatch.setattr(sim, "EMB_VERIFY_FLOAT_MAX_N", 0)
    keep_int16 = {
        tuple(r) for r in sim.dedup_embedding_keep(spark, sf_dir).collect()
    }
    assert keep_float == keep_int16
    assert len(keep_float) > 0


def test_dispatcher_counts_corpus_once(spark, sf_dir, monkeypatch):
    """The arm dispatch pays ONE plan-time count: the prebuilt stage is
    passed down, so _adaptive_stage runs exactly once per keep-list call
    (a second count is a second full scan at 100M vectors)."""
    from restaurant_etl_spark.operators import similarity as sim

    calls = []
    real = sim._adaptive_stage

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sim, "_adaptive_stage", spy)
    sim._verified_dup_pairs(spark, sf_dir)
    assert len(calls) == 1
