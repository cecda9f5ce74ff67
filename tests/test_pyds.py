"""Python Data Source API (sources/pyds.py): partition planning, filter
pushdown into the partition plan, and value correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.sources.pyds import corpus_row, register_once


def _read(spark, **opts):
    register_once(spark)
    r = spark.read.format("menu_corpus")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_rows_match_closed_form(spark):
    got = {r["doc_id"]: tuple(r) for r in _read(spark, n_docs=40).collect()}
    assert len(got) == 40
    for i in range(40):
        assert got[i] == corpus_row(i)


def test_partition_planning(spark):
    df = _read(spark, n_docs=1000, rows_per_partition=100)
    assert df.rdd.getNumPartitions() == 10


def test_filter_pushdown_prunes_partitions(spark):
    """doc_id range predicates must be ABSORBED into the partition plan:
    [300, 500) at 100 rows/partition plans 2 partitions, not 10 — the
    pruned ranges are never generated at all."""
    df = _read(spark, n_docs=1000, rows_per_partition=100).filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 500)
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 2


def test_unsupported_filters_still_correct(spark):
    """A predicate pushFilters declines (category equality) is re-applied
    by Spark post-scan — over-claiming is impossible by construction."""
    df = _read(spark, n_docs=400).filter(
        (F.col("category") == "Mains") & (F.col("doc_id") >= 100)
    )
    rows = df.collect()
    assert {r["category"] for r in rows} == {"Mains"}
    assert len(rows) == 75  # doc_id % 4 == 1 in [100, 400)
    assert min(r["doc_id"] for r in rows) == 101
