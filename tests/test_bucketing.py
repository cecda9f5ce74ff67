"""Bucketed co-located join: the pre-shuffled storage layout that removes
the join exchange entirely — the bucketing scale pattern for repeated big
joins on the same key (SURVEY.md §2B partitioning strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    from restaurant_etl_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables across sessions but leaves their
    # warehouse directories behind — clear them
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    yield ("b_orders", "b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # force the shuffle-join path (at test scale the small side would
    # broadcast, which sidesteps what bucketing is for)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        l = spark.table("b_lineitem")
        joined = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # both sides pre-bucketed on the join key: SortMergeJoin with NO
    # exchange below it (the only exchange left is the final aggregation's)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    from restaurant_etl_spark.sources.tables import load_table

    o = spark.table("b_orders")
    l = spark.table("b_lineitem")
    bucketed = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    po = load_table(spark, sf_dir, "orders")
    pl = load_table(spark, sf_dir, "lineitem")
    plain = (
        po.join(pl, po.o_orderkey == pl.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
