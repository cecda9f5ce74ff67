"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from restaurant_etl_spark.operators.registry import load_all
from scripts.check_oracle import canonicalize

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only contract: must run and return a stable schema
        assert sdf.columns
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    s_cols, s_hash, s_n = canonicalize(sdf.columns, srows)
    d_cols, d_hash, d_n = canonicalize(dcols, drows)
    assert s_cols == d_cols, f"column mismatch: {s_cols} != {d_cols}"
    assert s_n == d_n, f"row count mismatch: {s_n} != {d_n}"
    assert s_hash == d_hash, "value hash mismatch"
