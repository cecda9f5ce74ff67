"""Reshaping & edge-semantics coverage (SURVEY.md §2B remainder):
explode_outer, stack/unpivot, inline, null-safe equality, unionByName with
missing columns, sampling, approximate percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "reshape_explode_outer",
    oracle="""
    SELECT DISTINCT c.c_custkey, o.o_orderpriority
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000) o
      ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey % 10 = 0
    """,
    category="relational",
)
def reshape_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: null row preserved for customers whose collected
    array is empty (R2 flatten generalized; equivalent to the LEFT JOIN
    the oracle states)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.array_distinct(F.collect_list("o_orderpriority")).alias("prios"))
    )
    return per_cust.select(
        "c_custkey", F.explode_outer("prios").alias("o_orderpriority")
    ).distinct()


@register(
    "reshape_stack_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey % 25 = 0
    UNION ALL
    SELECT p_partkey, 'retail' AS metric, p_retailprice AS value
    FROM part WHERE p_partkey % 25 = 0
    """,
    category="relational",
)
def reshape_stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack(): two measure columns become
    (metric, value) rows."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0)
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'retail', p_retailprice) AS (metric, value)"
        ),
    )


@register(
    "reshape_inline_structs",
    oracle="""
    SELECT n_nationkey, 'name' AS field, n_name AS val FROM nation
    UNION ALL
    SELECT n_nationkey, 'region' AS field, CAST(n_regionkey AS VARCHAR) AS val FROM nation
    """,
    category="relational",
)
def reshape_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(): explode an array of structs into columns+rows in one step."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.inline(
            F.array(
                F.struct(F.lit("name").alias("field"), F.col("n_name").alias("val")),
                F.struct(
                    F.lit("region").alias("field"),
                    F.col("n_regionkey").cast("string").alias("val"),
                ),
            )
        ),
    )


@register(
    "null_safe_equality_join",
    oracle="""
    SELECT a.s_suppkey AS sup_a, b.s_suppkey AS sup_b
    FROM supplier a JOIN supplier b
      ON nullif(a.s_nationkey, 3) IS NOT DISTINCT FROM nullif(b.s_nationkey, 3)
     AND a.s_suppkey < b.s_suppkey
    WHERE a.s_suppkey % 5 = 0 AND b.s_suppkey % 5 = 0
    """,
    category="relational",
)
def null_safe_equality_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): nulls compare equal, so nation 3 (nulled
    out) still pairs with itself — plain = would drop those rows."""
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 5 == 0)
    a = s.alias("a")
    b = s.alias("b")
    key = lambda side: F.nullif(F.col(f"{side}.s_nationkey"), F.lit(3))  # noqa: E731
    return a.join(
        b, key("a").eqNullSafe(key("b")) & (F.col("a.s_suppkey") < F.col("b.s_suppkey"))
    ).select(F.col("a.s_suppkey").alias("sup_a"), F.col("b.s_suppkey").alias("sup_b"))


@register(
    "union_by_name_missing_cols",
    oracle="""
    SELECT c_custkey AS entity_key, c_acctbal AS balance, c_mktsegment AS segment
    FROM customer WHERE c_custkey % 100 = 0
    UNION ALL
    SELECT s_suppkey AS entity_key, s_acctbal AS balance, CAST(NULL AS VARCHAR) AS segment
    FROM supplier WHERE s_suppkey % 20 = 0
    """,
    category="relational",
)
def union_by_name_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-aligned union where the
    supplier side lacks the segment column (null-filled)."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 100 == 0)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 20 == 0)
        .select(F.col("s_suppkey").alias("entity_key"), F.col("s_acctbal").alias("balance"))
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "sample_bernoulli_seeded",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substring(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                       CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'
    """,
    category="relational",
)
def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample via a content hash instead of a
    seeded RNG: keep rows whose md5(key) starts below 0x1a (26/256 = 10.2%).
    Unlike .sample(seed=), the hash filter is replayable on any engine and
    stable under repartitioning — the property that matters when a 100 TB
    profiling pass must be reproducible across reruns and engines."""
    l = _t(spark, sf_dir, "lineitem")
    bucket = F.substring(
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        2,
    )
    return l.filter(bucket < "1a").select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           TRUE AS median_in_bounds,
           TRUE AS p99_in_bounds
    FROM orders
    GROUP BY o_orderstatus
    """,
    category="relational",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL/GK-style sketch) — the 100 TB path for
    quantiles (single pass, bounded memory, no full sort). Sketch values are
    engine-specific, so the oracle check asserts the sketch lands inside
    exact-percentile bounds computed in the same job: approx p50 within
    exact [p45, p55], approx p99 within [p98.5, max]. The oracle emits the
    group keys, counts, and literal TRUE flags — any sketch drift outside
    bounds hash-mismatches."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("am"),
        F.expr("percentile(o_totalprice, 0.45)").alias("lo50"),
        F.expr("percentile(o_totalprice, 0.55)").alias("hi50"),
        F.percentile_approx("o_totalprice", 0.99, 1000).alias("a99"),
        F.expr("percentile(o_totalprice, 0.985)").alias("lo99"),
        F.max("o_totalprice").alias("hi99"),
    )
    return agg.select(
        "o_orderstatus",
        "n_orders",
        F.col("am").between(F.col("lo50"), F.col("hi50")).alias("median_in_bounds"),
        F.col("a99").between(F.col("lo99"), F.col("hi99")).alias("p99_in_bounds"),
    )
