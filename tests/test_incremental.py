"""Incremental re-run semantics (operators/incremental.py): first tick
processes everything, second tick is a no-op, a new or touched file is
re-processed alone, and output accumulates without duplicates."""

from __future__ import annotations

import os

from restaurant_etl_spark.operators.incremental import (
    load_manifest,
    run_incremental_menu,
)

MENU = "SNACKS\nSamosa ... $5.00\nTea $2.00\n"


def _write(d, name, text):
    p = d / name
    p.write_text(text)
    return str(p)


def test_incremental_delta_semantics(spark, tmp_path):
    inp = tmp_path / "inp"
    inp.mkdir()
    _write(inp, "1.txt", MENU)
    _write(inp, "2.txt", MENU.replace("$5.00", "$7.00"))
    state = str(tmp_path / "state")

    r1 = run_incremental_menu(spark, str(inp), state)
    assert r1["n_discovered"] == 2 and r1["n_pending"] == 2 and r1["n_items"] > 0

    # tick 2: nothing new → no work, no output rows appended
    r2 = run_incremental_menu(spark, str(inp), state)
    assert r2["n_pending"] == 0 and r2["n_items"] == 0

    # tick 3: one new file → exactly one pending
    _write(inp, "3.txt", MENU)
    r3 = run_incremental_menu(spark, str(inp), state)
    assert r3["n_pending"] == 1

    # tick 4: touch file 1 with changed bytes → re-processed alone
    import time

    time.sleep(1.1)  # mtime resolution
    _write(inp, "1.txt", MENU.replace("Tea", "Chai"))
    r4 = run_incremental_menu(spark, str(inp), state)
    assert r4["n_pending"] == 1

    # manifest: one row per processed (path, fingerprint) — 1.txt twice
    man = load_manifest(spark, state)
    assert man.count() == 4  # ticks: 2 + 1 + 1
    assert man.filter(man.path.endswith("1.txt")).count() == 2

    # output accumulates once per processed doc-version, tagged by run
    items = spark.read.parquet(os.path.join(state, "items"))
    assert items.select("run_id").distinct().count() == 3  # ticks 1, 3, 4
