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
