"""bench_streaming's vs_prev envelope classification (VERDICT r10 #8):
pure-Python contract — a prior reading inside this round's fresh-JVM
pooled envelope is run variance; outside it is a confirmed delta with a
direction; a workload without an envelope says so instead of guessing."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from bench_streaming import _classify_vs_prev  # noqa: E402


def _wl(pooled_env):
    return {"envelope": {"pooled_rows_per_sec": pooled_env}}


def test_prev_inside_envelope_is_run_variance():
    vs = {"cdc": {"prev_rows_per_sec": 1000.0}}
    _classify_vs_prev(vs, {"cdc": _wl([900.0, 1000.0, 1100.0])})
    assert vs["cdc"]["classification"] == "run_variance"
    assert vs["cdc"]["envelope_pooled_rows_per_sec"] == [900.0, 1100.0]


def test_prev_below_envelope_is_confirmed_faster():
    vs = {"cdc": {"prev_rows_per_sec": 800.0}}
    _classify_vs_prev(vs, {"cdc": _wl([900.0, 1000.0, 1100.0])})
    assert vs["cdc"]["classification"] == "confirmed_faster"


def test_prev_above_envelope_is_confirmed_slower():
    vs = {"cdc": {"prev_rows_per_sec": 1200.0}}
    _classify_vs_prev(vs, {"cdc": _wl([900.0, 1000.0, 1100.0])})
    assert vs["cdc"]["classification"] == "confirmed_slower"


def test_missing_envelope_is_labeled():
    vs = {"cdc": {"prev_rows_per_sec": 1200.0}}
    _classify_vs_prev(vs, {"cdc": {}})
    assert vs["cdc"]["classification"] == "no_envelope"


def test_none_vs_prev_is_noop():
    _classify_vs_prev(None, {})  # must not raise


def test_incomplete_envelope_never_confirms():
    """ADVICE r11: a repetition with a missing pooled throughput makes the
    envelope partial — classify no_envelope, never confirmed_*."""
    vs = {"cdc": {"prev_rows_per_sec": 800.0}}
    _classify_vs_prev(
        vs,
        {"cdc": {"envelope": {
            "pooled_rows_per_sec": [900.0, 1100.0], "n_runs": 3,
            "complete": False,
        }}},
    )
    assert vs["cdc"]["classification"] == "no_envelope"


def test_empty_envelope_is_no_envelope():
    vs = {"cdc": {"prev_rows_per_sec": 800.0}}
    _classify_vs_prev(
        vs, {"cdc": {"envelope": {"pooled_rows_per_sec": [], "complete": False}}}
    )
    assert vs["cdc"]["classification"] == "no_envelope"


def test_warm_jvm_prev_outside_envelope_is_methodology_change():
    """ADVICE r11: an out-of-envelope delta against a pre-envelope
    (warm-JVM single-run) artifact conflates the methodology change with
    true drift — tag it, don't confirm it."""
    vs = {"cdc": {"prev_rows_per_sec": 1200.0, "prev_fresh_jvm": False}}
    _classify_vs_prev(
        vs,
        {"cdc": {"envelope": {
            "pooled_rows_per_sec": [900.0, 1000.0, 1100.0],
            "n_runs": 3, "complete": True,
        }}},
    )
    assert vs["cdc"]["classification"] == "methodology_change"


def test_warm_jvm_prev_inside_envelope_is_still_run_variance():
    vs = {"cdc": {"prev_rows_per_sec": 1000.0, "prev_fresh_jvm": False}}
    _classify_vs_prev(
        vs,
        {"cdc": {"envelope": {
            "pooled_rows_per_sec": [900.0, 1100.0], "n_runs": 2,
            "complete": True,
        }}},
    )
    assert vs["cdc"]["classification"] == "run_variance"


def test_envelope_drops_none_readings():
    """_envelope must drop None pooled readings rather than coerce to 0
    (the lower bound would otherwise pin at 0 forever)."""
    import bench_streaming as bs

    runs = [
        {"steady": {"rows_per_sec": 10.0, "batch_ms": {"median": 5.0}},
         "pooled": {"rows_per_sec": 11.0}},
        {"steady": {"rows_per_sec": None, "batch_ms": {"median": None}},
         "pooled": {"rows_per_sec": None}},
        {"steady": {"rows_per_sec": 12.0, "batch_ms": {"median": 6.0}},
         "pooled": {"rows_per_sec": 13.0}},
    ]
    calls = iter(runs)
    orig = bs._run_point
    bs._run_point = lambda *a, **k: next(calls)
    try:
        rep = bs._envelope("session", "/tmp", 3)
    finally:
        bs._run_point = orig
    env = rep["envelope"]
    assert env["pooled_rows_per_sec"] == [11.0, 13.0]
    assert env["steady_median_batch_ms"] == [5.0, 6.0]
    assert env["complete"] is False


def test_session_big_file_count_parses_from_workload_name(monkeypatch, capsys):
    """The x100 state decade passes session_big:1600 through the child
    protocol — _run_one must hand that file count to the session
    workload, defaulting to 160 for the bare x10 form."""
    import bench_streaming as bs

    seen = []

    class _Conf:
        def set(self, *a):
            pass

    class _Spark:
        conf = _Conf()

    monkeypatch.setattr(bs, "get_spark", lambda *a, **k: _Spark())
    monkeypatch.setattr(
        bs,
        "bench_session_windows",
        lambda spark, sf_dir, n_files=16, files_per_trigger=2, tag="": (
            seen.append(n_files) or {}
        ),
    )
    bs._run_one("session_big:1600", "/tmp/x", "_t")
    bs._run_one("session_big", "/tmp/x", "_t")
    assert seen == [1600, 160]


def test_retention_scales_with_workload(monkeypatch):
    """ADVICE r12: numRecentProgressUpdates is derived from the expected
    batch count, not pinned — a x1000 session point (8000 batches) must
    set retention above its drain length."""
    import bench_streaming as bs

    seen = {}

    class _Conf:
        def set(self, k, v):
            seen[k] = v

    class _Spark:
        conf = _Conf()

    monkeypatch.setattr(bs, "get_spark", lambda *a, **k: _Spark())
    monkeypatch.setattr(
        bs,
        "bench_session_windows",
        lambda spark, sf_dir, n_files=16, files_per_trigger=2, tag="": {},
    )
    bs._run_one("session_big:16000", "/tmp/x", "_t")
    kept = int(seen["spark.sql.streaming.numRecentProgressUpdates"])
    assert kept >= 8000, f"retention {kept} would truncate an 8000-batch drain"


def test_run_one_refuses_truncated_progress(monkeypatch):
    """If the drain reports fewer triggers than expected, the totals are
    truncated — _run_one must refuse to emit them."""
    import pytest

    import bench_streaming as bs

    class _Conf:
        def set(self, *a):
            pass

    class _Spark:
        conf = _Conf()

    monkeypatch.setattr(bs, "get_spark", lambda *a, **k: _Spark())
    monkeypatch.setattr(
        bs,
        "bench_session_windows",
        lambda spark, sf_dir, n_files=16, files_per_trigger=2, tag="": {
            "batches": 3,
            "empty_triggers": 1,
        },
    )
    with pytest.raises(SystemExit, match="truncated"):
        bs._run_one("session_big:1600", "/tmp/x", "_t")


def test_envelope_representative_skips_none_runs(monkeypatch):
    """ADVICE r12: the representative run comes from repetitions with
    real steady readings; a majority-failed envelope raises instead of
    propagating None stats into the decade ratios."""
    import pytest

    import bench_streaming as bs

    def _mk(rps):
        return {
            "steady": {"rows_per_sec": rps, "batch_ms": {"median": 1.0}},
            "pooled": {"rows_per_sec": rps},
        }

    runs = iter([_mk(None), _mk(500.0), _mk(700.0)])
    monkeypatch.setattr(bs, "_run_point", lambda *a, **k: next(runs))
    rep = bs._envelope("cdc", "/tmp/x", 3)
    # median of the 2 live runs (index 1 of sorted [500, 700]) — never the
    # None run
    assert rep["steady"]["rows_per_sec"] == 700.0
    assert rep["envelope"]["complete"] is False

    runs2 = iter([_mk(None), _mk(None), _mk(500.0)])
    monkeypatch.setattr(bs, "_run_point", lambda *a, **k: next(runs2))
    with pytest.raises(RuntimeError, match="envelope unusable"):
        bs._envelope("cdc", "/tmp/x", 3)
