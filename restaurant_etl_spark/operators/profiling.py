"""Data profiling and quality checks — the observability surface a 100 TB
ingest runs before anything else touches the data: per-column statistics
and rule-violation counts, each one scan with partial aggregation.

The reference's equivalent is its ad-hoc validity logging
(restaurant_etl/llm_parser.py logging of skipped/invalid items); here the
checks are first-class queries with closed-form oracles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]


@register(
    "profile_orders_columns",
    oracle="""
    """
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_s,
               CAST(max({c}) AS VARCHAR) AS max_s
        FROM orders"""
        for c in _PROFILE_COLS
    ),
    category="profiling",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: null count, distinct count, min/max (as strings,
    type-uniform) for each profiled column. Expressed as a union of
    single-scan aggregates; Catalyst executes each leg with map-side
    partial aggregation, and at scale the legs share the cached scan. The
    string casts keep one output schema for any column type — the shape a
    profiling UI or expectation store consumes."""
    o = load_table(spark, sf_dir, "orders")
    legs = [
        o.agg(
            F.lit(c).alias("col"),
            (F.count("*") - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_s"),
            F.max(c).cast("string").alias("max_s"),
        )
        for c in _PROFILE_COLS
    ]
    return reduce(DataFrame.unionByName, legs)


@register(
    "dq_violation_counts",
    oracle="""
    SELECT
        (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS nonpositive_price,
        (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_custkey,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS orphan_orders,
        (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
            AS discount_out_of_range,
        (SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate < o.o_orderdate) AS ship_before_order
    """,
    category="profiling",
)
def dq_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule battery in one row: nonpositive prices, null keys,
    referential orphans (anti join), out-of-range discounts, and the
    cross-table ship-before-order rule (equi join on the order key). Each
    rule is a filtered count — partial-aggregated, join rules shuffle on
    their key once. The single-row summary is what a pipeline gate
    alerts on."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    nonpos = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("nonpositive_price")
    )
    nullkey = o.filter(F.col("o_custkey").isNull()).agg(F.count("*").alias("null_custkey"))
    orphans = o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
        F.count("*").alias("orphan_orders")
    )
    disc = li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).agg(
        F.count("*").alias("discount_out_of_range")
    )
    ship = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count("*").alias("ship_before_order"))
    )
    return nonpos.crossJoin(nullkey).crossJoin(orphans).crossJoin(disc).crossJoin(ship)
