"""QUERIES.md must match the live registry (VERDICT r3 directive #9): the
manifest is generated, committed, and pinned by this test so the driver's
sampling and human auditors always land on a documented surface."""

from __future__ import annotations

import os

from restaurant_etl_spark.operators.registry import load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_registry():
    from scripts.gen_queries_md import OUT, render

    assert os.path.exists(OUT), "QUERIES.md missing — run scripts/gen_queries_md.py"
    with open(OUT) as f:
        committed = f.read()
    assert committed == render(), (
        "QUERIES.md is stale — regenerate with: python scripts/gen_queries_md.py"
    )


def test_manifest_lists_every_query():
    with open(os.path.join(REPO, "QUERIES.md")) as f:
        text = f.read()
    for name in load_all():
        assert f"`{name}`" in text, f"{name} missing from QUERIES.md"
