"""Atomic fingerprint-keyed staging (sources/staging.py)."""

from __future__ import annotations

import os

from restaurant_etl_spark.sources.staging import source_fingerprint, stage_once


def test_stage_once_builds_once(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    calls = []

    def build(d):
        calls.append(d)
        open(os.path.join(d, "payload.txt"), "w").write("x")

    p1 = stage_once("t_once", "fp1", build)
    p2 = stage_once("t_once", "fp1", build)
    assert p1 == p2 and len(calls) == 1
    assert os.path.exists(os.path.join(p1, "payload.txt"))
    assert os.path.exists(os.path.join(p1, "_STAGED_OK"))
    tempfile.tempdir = None


def test_fingerprint_change_restages(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    calls = []
    build = lambda d: (calls.append(d), open(os.path.join(d, "f"), "w").close())
    a = stage_once("t_fp", "aaa", build)
    b = stage_once("t_fp", "bbb", build)
    assert a != b and len(calls) == 2
    tempfile.tempdir = None


def test_partial_stale_dir_is_replaced(tmp_path, monkeypatch):
    """A legacy/crashed stage (dir exists, no marker) must be replaced, not
    trusted."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    stale = tmp_path / "t_stale_fpX"
    stale.mkdir()
    (stale / "halfwritten").touch()

    out = stage_once(
        "t_stale", "fpX", lambda d: open(os.path.join(d, "good"), "w").close()
    )
    assert os.path.exists(os.path.join(out, "good"))
    assert os.path.exists(os.path.join(out, "_STAGED_OK"))
    assert not os.path.exists(os.path.join(out, "halfwritten"))
    tempfile.tempdir = None


def test_source_fingerprint_tracks_mtime_and_size(tmp_path):
    f = tmp_path / "src.parquet"
    f.write_bytes(b"abc")
    fp1 = source_fingerprint(str(f))
    assert fp1 == source_fingerprint(str(f))  # stable
    f.write_bytes(b"abcd")
    assert source_fingerprint(str(f)) != fp1
