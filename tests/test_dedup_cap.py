"""Document-frequency cap on the exact Jaccard inverted-index join.

Plants a corpus where every document shares one boilerplate stop-shingle
(the 100 TB failure mode: a hot posting list making the self-join
quadratic) plus a pair of true near-duplicates, and proves:

  * the capped candidate index excludes the stop-shingle entirely;
  * true near-dup pairs still come out with EXACT (uncapped) Jaccard;
  * pairs related ONLY through the stop-shingle produce no output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.operators.dedup import (
    _exact_jaccard_pairs,
    shingle_table,
)

STOP = "the daily menu"  # 3-token boilerplate shared by every doc


def _corpus(spark):
    # docs 1 and 2: near-identical (differ in one trailing token)
    # docs 3..12: unrelated bodies, all sharing only the STOP shingle
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"{STOP} {base} lambda"),
        (2, f"{STOP} {base} omega"),
    ] + [
        (i, f"{STOP} body{i} filler{i} word{i} tail{i} end{i}")
        for i in range(3, 13)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_stop_shingle_excluded_from_candidates(spark):
    sh = shingle_table(_corpus(spark))
    # the planted stop-shingle really is hot: df == 12 (every doc)
    df_of_stop = (
        sh.filter(F.col("shingle") == STOP).groupBy("shingle").count().collect()
    )
    assert df_of_stop[0]["count"] == 12

    # cap below its DF: only the true near-dup pair survives, and its
    # jaccard is the EXACT uncapped value (common shingles counted against
    # the full shingle sets, stop-shingle included)
    pairs = _exact_jaccard_pairs(sh, threshold=0.5, df_cap=5).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]

    uncapped = _exact_jaccard_pairs(sh, threshold=0.5, df_cap=10**9).collect()
    [(exact,)] = [
        [(r["jaccard"])] for r in uncapped if (r["doc_a"], r["doc_b"]) == (1, 2)
    ]
    assert pairs[0]["jaccard"] == exact


def test_cap_bounds_posting_list(spark):
    """With the cap in force, no candidate pair may arise from the hot
    shingle: unrelated docs (3..12) share only STOP, so candidate count
    collapses from C(10,2)+1 pairs to exactly 1."""
    sh = shingle_table(_corpus(spark))
    uncapped = _exact_jaccard_pairs(sh, threshold=0.0, df_cap=10**9).collect()
    capped = _exact_jaccard_pairs(sh, threshold=0.0, df_cap=5).collect()
    assert len(uncapped) == 66  # C(12,2): every doc pairs with every other
    assert len(capped) == 1


def test_exact_baseline_size_guard(spark, monkeypatch):
    """dedup_embedding_cosine must REFUSE to run its O(n^2) comparison
    above the documented row cap — a clear error, not a silent attempt
    (VERDICT r4 #5). The cap is lowered so the sf0.001 fixture trips it."""
    import pytest

    from restaurant_etl_spark.operators import similarity

    monkeypatch.setattr(similarity, "EXACT_BASELINE_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="O\\(n\\^2\\) baseline capped at 10"):
        similarity.dedup_embedding_cosine(spark, "/root/testdata/sf0.001")
    # and under the cap it still runs (the guard is a gate, not a break)
    monkeypatch.setattr(similarity, "EXACT_BASELINE_MAX_ROWS", 10_000_000)
    assert similarity.dedup_embedding_cosine(spark, "/root/testdata/sf0.001").count() >= 0


def test_two_part_counts_equal_bruteforce_on_random_corpora(spark):
    """_candidate_common_counts (r6 rewrite: capped direct counts + hot
    correction) must produce EXACTLY the brute-force common-shingle count
    for every candidate pair, across corpora where the cap is active.
    Deterministic pseudo-random corpora; cap=3 so several shingles are
    hot by construction."""
    import hashlib

    from restaurant_etl_spark.operators.dedup import _candidate_common_counts

    for seed in range(3):
        # ~14 docs of 6 tokens over a tiny alphabet -> dense overlap with
        # both rare and hot shingles at cap=3
        def tok(i, j):
            return f"t{int(hashlib.md5(f'{seed}:{i}:{j}'.encode()).hexdigest()[:4], 16) % 7}"

        rows = [(i, " ".join(tok(i, j) for j in range(6))) for i in range(14)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        from restaurant_etl_spark.operators.dedup import shingle_table

        sh = shingle_table(docs)
        got = {
            (r.doc_a, r.doc_b): r.n_common
            for r in _candidate_common_counts(sh, df_cap=3).collect()
        }
        # brute force in python
        shingles = {}
        for r in sh.collect():
            shingles.setdefault(r.doc_id, set()).add(r.shingle)
        df = {}
        for ss in shingles.values():
            for s_ in ss:
                df[s_] = df.get(s_, 0) + 1
        expect = {}
        ids = sorted(shingles)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                common = shingles[a] & shingles[b]
                # candidate iff >=1 BELOW-cap common shingle
                if any(df[s_] <= 3 for s_ in common):
                    expect[(a, b)] = len(common)
        assert got == expect, f"seed {seed}: {got} != {expect}"
