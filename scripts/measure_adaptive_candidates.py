"""Measure the production embedding keep-list's candidate growth across
scale points (VERDICT r7 #1: prove the widened adaptive band keeps
candidate pairs/vector ~constant at n=200k, where the old B≤16 clamp
would have bound and re-quadratized).

Runs the EXACT candidate stage of ``dedup_embedding_keep``
(`similarity._adaptive_cand`) per directory and prints one JSON line per
scale point: n, band width B, candidate pairs, pairs/vector, and what
the OLD 32-bit-signature clamp (B ≤ 16) would have produced in
expectation — ``old_clamp_expected_pairs`` ≈ bands·C(n,2)/2^min(bitlen,16)
random collisions — so the avoided quadratic is visible in the same row.

Usage:
    python scripts/measure_adaptive_candidates.py DIR [DIR ...]

Scale points: sf0.1 has n=2k, /tmp/spark_graft_sf1 n=20k, and
``make_sfN.py --mult 100 --src /root/testdata/sf0.1 --tables embeddings
--dst /tmp/spark_graft_emb200k`` builds the n=200k point (embeddings
only; other tables copied as-is).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from restaurant_etl_spark.operators.similarity import (
    ADAPT_BANDS,
    ADAPT_MIN_B,
    _adaptive_pair_count,
    _quantized_dup_pairs,
)
from restaurant_etl_spark.session import get_spark


def main() -> int:
    argv = sys.argv[1:]
    measure_old = "--measure-old-clamp" in argv
    if measure_old:
        argv.remove("--measure-old-clamp")
    # --only=pairs / --only=dups (r14): at n=100M the pair-count
    # aggregations' shuffle files (~10 GB) and the dup count's ~35 GB
    # band exchange cannot coexist in one process's block manager on
    # this box (shuffle files free only at process exit) — run the two
    # halves as separate invocations and merge the printed fields.
    only = None
    for flag in list(argv):
        if flag.startswith("--only="):
            only = flag.split("=", 1)[1]
            assert only in ("pairs", "dups"), only
            argv.remove(flag)
    dirs = argv
    if not dirs:
        print(__doc__, file=sys.stderr)
        return 2
    spark = get_spark()
    for d in dirs:
        # split candidates into TRUE near-dups (cos >= 0.3 — the keep-list's
        # verified output, a data property that any correct dedup must
        # examine) and WASTE (random band collisions — the quantity the
        # adaptive width bounds at Θ(n)): the Θ(n) claim is about waste.
        # r13 (VERDICT r12 #4): counted via shapes that never materialize
        # the pair list — pairs from the inclusion-exclusion band-group
        # closed form (three aggregations, zero pair rows; equals
        # ids.count() exactly, tests/test_emb_quantized.py), dups from
        # the integer-prefiltered exact verify (provably the same count as
        # the all-float verify) — so this measurement survives the
        # n=100M point where even the ids-only pair DISTINCT ENOSPC'd
        # (ORACLE_EMB100M_r12.log attempt 4; r13 retry at 55 GB free).
        pairs = dups = None
        if only in (None, "pairs"):
            _e, n, width, pairs = _adaptive_pair_count(spark, d)
        if only in (None, "dups"):
            _e2, n, width, dup = _quantized_dup_pairs(spark, d)
            dups = dup.count()
        old_b = min(16, max(ADAPT_MIN_B, int(n).bit_length()))
        row = {
            "dir": d,
            "n": n,
            "band_width": width,
            "cand_pairs": pairs,
            "true_dup_pairs": dups,
            "old_clamp_b": old_b,
            "old_clamp_expected_pairs":
                round(ADAPT_BANDS * n * (n - 1) / 2 / (1 << old_b)),
        }
        if pairs is not None and dups is not None:
            row.update(
                waste_pairs=pairs - dups,
                waste_per_vector=round((pairs - dups) / n, 3),
                pairs_per_vector=round(pairs / n, 3),
            )
        if measure_old and old_b < width:
            # counterfactual: the SAME pipeline pinned to the r7 clamp —
            # measured, not estimated
            _e3, _n3, _w3, old_pairs = _adaptive_pair_count(
                spark, d, force_width=old_b
            )
            row["old_clamp_measured_pairs"] = old_pairs
            if dups is not None:
                row["old_clamp_waste_per_vector"] = round((old_pairs - dups) / n, 3)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
