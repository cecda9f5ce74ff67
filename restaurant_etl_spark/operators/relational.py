"""Relational query surface (SURVEY.md §2B) over the synthetic star schema.

Every query here is declarative DataFrame/SQL — Catalyst handles pushdown,
pruning, join selection, partial aggregation; we add explicit
``F.broadcast`` hints for the bounded dimension tables (region/nation:
25/5 rows at ANY scale factor) and unique-key tiebreakers on every top-k.

Oracle parity rules are documented in registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.functions.money import (
    FRAC_DEC,
    QTY_DEC,
    SQL_DISC_PRICE,
    SQL_PRICE,
    avg_on_grid,
    avg_on_grid_from_cents,
    cents,
    charge,
    disc_price,
    disc_price_units,
    frac,
    frac_units,
    sum_units_split,
    money,
    sql_avg_on_grid,
    sum_cents,
    sum_money,
    sum_money_grid,
    sum_split_round2,
)
from restaurant_etl_spark.operators.asof import asof_join
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H-style analytical queries
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(8,2))), 2) AS DOUBLE)      AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(1 - l_discount AS DECIMAL(4,2))
                          * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE)      AS sum_charge,
           {sql_avg_on_grid("l_quantity", QTY_DEC, 2, "avg_qty")},
           {sql_avg_on_grid("l_extendedprice", "DECIMAL(12,2)", 2, "avg_price")},
           {sql_avg_on_grid("l_discount", FRAC_DEC, 4, "avg_disc")},
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="relational",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed date filter → hash agg (partial+final).

    Parity with reference A1-A4 summary aggregations
    (restaurant_etl/models/menu_models.py:229-248) generalized to lineitem.
    Averages derive from the exact decimal sums via integer-only HALF_UP
    (ADVICE r7: DOUBLE avg accumulation is the q7/q9 sf1 drift class).

    r16 (VERDICT r15 #3, guide §5): the seven money sums are carried as
    BIGINT scaled integers instead of DECIMAL(27,4)/(32,6) — the wide
    decimal sums exceeded the compact-long precision limit, so every
    aggregation-buffer update paid a JavaBigDecimal round-trip. Each
    grid value is an exact scaled integer (same decimal-cast snap), the
    partial/final sums are plain long adds, and one per-group finish
    reassembles the exact decimal and rounds — value-identical by the
    overflow bounds documented in functions/money.py (the 4-dec and
    6-dec sums split into DIV/MOD accumulator pairs so the carry fits
    BIGINT at 100 TB group sizes)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
    d4 = cents("l_extendedprice") * frac_units(F.lit(1) - F.col("l_discount"))
    c6 = d4 * frac_units(F.lit(1) + F.col("l_tax"))
    rows = l.select(
        "l_returnflag",
        "l_linestatus",
        cents("l_quantity").alias("qc"),
        cents("l_extendedprice").alias("pc"),
        frac_units(F.col("l_discount")).alias("dc"),
        d4.alias("d4"),
        c6.alias("c6"),
    )
    agg = rows.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qc").alias("sq"),
        F.sum("pc").alias("sp"),
        F.sum(F.expr("d4 DIV 10000")).alias("dd"),
        F.sum(F.expr("d4 % 10000")).alias("dm"),
        F.sum(F.expr("c6 DIV 1000000")).alias("cd"),
        F.sum(F.expr("c6 % 1000000")).alias("cm"),
        F.sum("dc").alias("sdisc"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        sum_cents("sq", "sum_qty"),
        sum_cents("sp", "sum_base_price"),
        sum_split_round2("dd", "dm", 4, "sum_disc_price"),
        sum_split_round2("cd", "cm", 6, "sum_charge"),
        avg_on_grid_from_cents("sq", "count_order", 2, "avg_qty"),
        avg_on_grid_from_cents("sp", "count_order", 2, "avg_price"),
        avg_on_grid_from_cents("sdisc", "count_order", 4, "avg_disc"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(round(sum({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    category="relational",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, agg, deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("_rev4", disc_price_units())
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(*sum_units_split("_rev4", 4, "_rev"))
        .select(
            "l_orderkey",
            sum_split_round2("_rev_d", "_rev_m", 4, "revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, CAST(round(sum({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    category="relational",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; region/nation broadcast (bounded dims)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("_rev4", disc_price_units())
        .groupBy("n_name")
        .agg(*sum_units_split("_rev4", 4, "_rev"))
        .select("n_name", sum_split_round2("_rev_d", "_rev_m", 4, "revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(round(sum({SQL_PRICE} * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    category="relational",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-filter scan + global agg (no shuffle of data,
    only partial-agg exchange)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .withColumn("_rev4", cents("l_extendedprice") * frac_units(F.col("l_discount")))
        .agg(
            *sum_units_split("_rev4", 4, "_rev"),
            F.count("*").alias("n_lines"),
        )
        .select(
            sum_split_round2("_rev_d", "_rev_m", 4, "revenue"),
            "n_lines",
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(round(sum({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    category="relational",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("_rev4", disc_price_units())
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(*sum_units_split("_rev4", 4, "_rev"))
        .select(
            "c_custkey",
            "c_name",
            sum_split_round2("_rev_d", "_rev_m", 4, "revenue"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Filters / projections / predicates
# --------------------------------------------------------------------------

@register(
    "filter_between_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 + l_tax), 4) AS gross
    FROM lineitem
    WHERE l_quantity >= 49 AND l_discount <= 0.01
    """,
    category="relational",
)
def filter_between_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down conjunctive filter + computed projection (SURVEY P1/P2 analog)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter((F.col("l_quantity") >= 49) & (F.col("l_discount") <= 0.01)).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        # 4 dp, not 2: the product's TRUE value lies on the 4-decimal grid
        # (2-dec price x 2-dec tax), so rounding to the grid is engine-safe;
        # rounding to 2 dp puts thousands of rows exactly on .xx5 half-cent
        # boundaries where Spark and DuckDB disagree (found by the sf0.1
        # full-registry replica, r6)
        F.round(F.col("l_extendedprice") * (1 + F.col("l_tax")), 4).alias("gross"),
    )


@register(
    "predicate_isin_like_regex",
    oracle="""
    SELECT p_brand,
           count(*) AS n_parts,
           CAST(count(*) FILTER (WHERE regexp_matches(p_name, '^(red|blue)')) AS BIGINT) AS n_colored
    FROM part
    WHERE p_type IN ('ECONOMY', 'PROMO') AND p_name LIKE '%bolt%'
    GROUP BY p_brand
    """,
    category="relational",
)
def predicate_isin_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isin / LIKE / regex predicate battery (reference P4 rlike analog,
    restaurant_etl/utils/clean_text.py:13-16)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").isin("ECONOMY", "PROMO") & F.col("p_name").like("%bolt%"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.count(F.when(F.col("p_name").rlike("^(red|blue)"), 1)).alias("n_colored"),
        )
    )


# --------------------------------------------------------------------------
# Join matrix
# --------------------------------------------------------------------------

@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_nationkey,
           count(DISTINCT c.c_custkey) AS n_customers,
           count(o.o_orderkey)         AS n_orders_1995h1
    FROM customer c
    LEFT JOIN (SELECT * FROM orders
               WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate <  TIMESTAMP '1995-07-01') o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey
    """,
    category="relational",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched customers (null-side counting)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders_1995h1"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.nk, s.nk) AS nationkey, c.n_customers, s.n_suppliers
    FROM (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
    category="relational",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated sides (null-padded both ways)."""
    c = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_customers"))
    s = _t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_suppliers"))
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers_with_urgent
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    category="relational",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 urgent order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_with_urgent"))
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers_no_orders,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
    category="relational",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders since 2001."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers_no_orders"),
            sum_money_grid("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r_name, t.p_type, concat(r_name, ':', t.p_type) AS label
    FROM region CROSS JOIN (SELECT DISTINCT p_type FROM part) t
    """,
    category="relational",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join of two bounded-cardinality inputs (5 regions × 6 part types)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    t = _t(spark, sf_dir, "part").select("p_type").distinct()
    return r.crossJoin(t).select("r_name", "p_type", F.concat_ws(":", "r_name", "p_type").alias("label"))


@register(
    "join_theta_self_pairs",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    category="relational",
)
def join_theta_self_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join: unordered same-region nation pairs (equi + < residual)."""
    n = _t(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@register(
    "join_range_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('small',  0.0,      100000.0),
        ('medium', 100000.0, 250000.0),
        ('large',  250000.0, 1e12))
    SELECT band, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    category="relational",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range (interval) join against a tiny broadcast band table."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("medium", 100000.0, 250000.0), ("large", 250000.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        o.join(F.broadcast(bands), (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), sum_money_grid("o_totalprice", "total"))
    )


@register(
    "asof_purchase_last_view",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    category="relational",
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest view at-or-before
    it. Implemented union+window (see operators/asof.py), not a quadratic
    non-equi join."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("view_ts"))
    joined = asof_join(
        purchases,
        views.withColumnRenamed("view_ts", "last_view_ts"),
        on=["user_id"],
        left_ts="ts",
        right_ts="last_view_ts",
        value_cols=["last_view_ts"],
        inclusive=True,
    )
    return joined.select("event_id", "user_id", "ts", "last_view_ts")


@register(
    "join_right_outer",
    oracle="""
    SELECT c.c_nationkey,
           count(DISTINCT c.c_custkey) AS n_customers,
           count(o.o_orderkey)         AS n_orders_1995h1
    FROM (SELECT * FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate <  TIMESTAMP '1995-07-01') o
    RIGHT JOIN customer c
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey
    """,
    category="relational",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (the mirror of join_left_outer, preserving the
    customer side from the right slot) — completes the outer-join matrix.
    Catalyst plans it as the same join with sides swapped; results must
    match the LEFT formulation exactly."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    return (
        o.join(c, c.c_custkey == o.o_custkey, "right")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders_1995h1"),
        )
    )
