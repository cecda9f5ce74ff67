"""The staged-artifact cache (VERDICT r10 #7): identical eager staging
(shingle arrays, common counts, pagerank invariants) is materialized once
per corpus per process and reused across sibling queries — keyed on the
table's file fingerprint so a rewritten corpus rebuilds instead of being
served stale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from restaurant_etl_spark.operators import staging
from restaurant_etl_spark.operators.dedup import _staged_common, _staged_sa


@pytest.fixture(autouse=True)
def _clean_cache():
    staging.clear_staged()
    yield
    staging.clear_staged()


def test_staged_builds_once_and_reuses(spark, sf_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    a = staging.staged(spark, sf_dir, "documents", "t", build)
    b = staging.staged(spark, sf_dir, "documents", "t", build)
    assert a is b and len(calls) == 1
    # a different label is a different artifact
    staging.staged(spark, sf_dir, "documents", "t2", build)
    assert len(calls) == 2


def test_staged_rekeys_on_table_rewrite(spark, tmp_path):
    p = str(tmp_path)
    spark.range(3).write.mode("overwrite").parquet(f"{p}/documents.parquet")
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(f"{p}/documents.parquet")

    assert staging.staged(spark, p, "documents", "t", build).count() == 3
    spark.range(7).write.mode("overwrite").parquet(f"{p}/documents.parquet")
    assert staging.staged(spark, p, "documents", "t", build).count() == 7
    assert len(calls) == 2


def test_staged_sa_and_common_shared_across_queries(spark, sf_dir):
    sa1 = _staged_sa(spark, sf_dir)
    sa2 = _staged_sa(spark, sf_dir)
    assert sa1 is sa2
    c1 = _staged_common(spark, sf_dir, sa1)
    c2 = _staged_common(spark, sf_dir, sa2)
    assert c1 is c2
    assert set(c1.columns) == {"doc_a", "doc_b", "n_common"}


def test_staged_values_match_unstaged_build(spark, sf_dir):
    """The cache must be value-invisible: the staged shingle arrays equal
    a fresh unstaged build row-for-row."""
    from restaurant_etl_spark.operators.dedup import _docs, shingle_arrays

    fresh = shingle_arrays(_docs(spark, sf_dir))
    cached = _staged_sa(spark, sf_dir)
    assert cached.count() == fresh.count()
    assert (
        cached.select("doc_id", F.explode("sharr").alias("s"))
        .exceptAll(fresh.select("doc_id", F.explode("sharr").alias("s")))
        .count()
        == 0
    )
