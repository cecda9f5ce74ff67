"""Aggregation, window-function, sort/limit, set-op and scalar-function
queries (SURVEY.md §2B).

Generalizes the reference's summary aggregations A1-A7
(restaurant_etl/models/menu_models.py:223-250) to the full relational
surface the driver's oracle exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from restaurant_etl_spark.functions.money import (
    QTY_DEC,
    sql_sum_money_grid,
    sum_money_grid,
)
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@register(
    "agg_events_by_type",
    oracle="""
    SELECT event_type,
           count(*)                     AS n_events,
           count(DISTINCT user_id)      AS n_users,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           round(avg(value), 4)         AS avg_value,
           round(min(value), 2)         AS min_value,
           round(max(value), 2)         AS max_value
    FROM events
    GROUP BY event_type
    """,
    category="relational",
)
def agg_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation battery: count / distinct / sum / avg / min / max.
    value lives on the 2-dec grid, so the per-type SUM goes through
    DECIMAL(12,2) for order-invariant cents at any scale (r13 money-grid
    sweep, VERDICT r12 #1); AVG self-normalizes (error/n) and stays
    double."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_money_grid("value", "sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*)                  AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="relational",
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (expand-based plan)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_lines"),
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT)  AS n_negative,
           CAST(count(*) FILTER (WHERE c_acctbal >= 5000) AS BIGINT) AS n_rich,
           CAST(sum(CAST(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END
                         AS DECIMAL(12,2))) AS DOUBLE) AS positive_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    category="relational",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / CASE WHEN) — null-safe predicate style
    mirroring reference A2 (count items where has_any_price). The money
    branch sums on the DECIMAL(12,2) grid (r13 sweep)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.count(F.when(F.col("c_acctbal") >= 5000, 1)).alias("n_rich"),
        sum_money_grid(
            F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0.0),
            "positive_balance",
        ),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
    category="relational",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + HAVING (post-aggregation filter)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), sum_money_grid("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_rollup_geo",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    category="relational",
)
def agg_rollup_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region → nation → grand total (broadcast dims)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), sum_money_grid("c_acctbal", "total_balance"))
    )


@register(
    "agg_cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="relational",
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both flag dimensions (all 2^2 grouping combinations)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        sum_money_grid("l_quantity", "sum_qty", dec=QTY_DEC),
        F.count("*").alias("n_lines"),
    )


@register(
    "agg_grouping_sets",
    # money totals sum as DECIMAL(12,2), not double (r12): the () grand
    # total reaches ~3.75e12 at sf10, where a double sum's accumulated FP
    # error exceeds a cent — round(sum(double), 2) then depends on
    # summation order (the regenerated-corpus hash moved while both
    # engines stayed green, ORACLE_SF10_SPOT_r12.log). Decimal sums are
    # exact, so the total is order-invariant at every scale.
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    category="relational",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (first-class in Spark SQL).
    The money total sums on the DECIMAL(12,2) grid so the grand-total
    cents are exact and summation-order-invariant (see oracle note)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register("agg_approx_distinct", oracle=None, category="relational")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — approximate, so rows-only check;
    semantically bounded instead: |approx - exact| / exact <= 0.06 (3x the
    configured rsd=0.02) per group, enforced by tests/test_sketch_bounds.py.
    At 100 TB this replaces exact COUNT(DISTINCT) where 2% error is fine:
    no expand, no second shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(CAST(median(o_totalprice) AS DOUBLE), 2)          AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    category="relational",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per group."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(row_number() OVER (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
        FROM part) t
    WHERE rn <= 3
    """,
    category="relational",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand: row_number with unique tiebreak."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    category="relational",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative running total per customer (deterministic order incl. key).

    Stays on doubles (r13 money-grid sweep): the window frame forces ONE
    summation order (o_orderdate, o_orderkey) in both engines, and the
    running sum is bounded per customer (~10^7 over ≤ dozens of orders),
    four decades under the magnitude where double sums lose cents."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select("o_orderkey", "o_custkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"))


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts)  OVER w) AS gap_us,
           round(lead(value) OVER w, 2)             AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="relational",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-event gap (µs, exact integer) and next value."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM events
    """,
    category="relational",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame moving average (ROWS BETWEEN 3 PRECEDING AND CURRENT)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, Window.currentRow)
    return e.select("event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("moving_avg"))


@register(
    "window_rank_ntile",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           CAST(rank()       OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4)     OVER w AS INTEGER) AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    category="relational",
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking battery: rank / dense_rank / ntile over a total order."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_first_last_range",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)  OVER w, 2) AS latest_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    category="relational",
)
def window_first_last_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit growing frame."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("latest_price"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / top-k
# --------------------------------------------------------------------------

@register(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    category="relational",
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst compiles to TakeOrderedAndProject (no full sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    category="relational",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): building-segment customers ∪ urgent-order customers."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.union(o).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    """,
    category="relational",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: machinery customers who placed a >200k order."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.intersect(o)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    category="relational",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with no pending-status order (set form of anti join)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o).distinct()


@register(
    "set_union_all_counts",
    oracle="""
    SELECT src, count(*) AS n FROM (
        SELECT 'customer' AS src FROM customer
        UNION ALL
        SELECT 'supplier' AS src FROM supplier
    ) GROUP BY src
    """,
    category="relational",
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) preserved through aggregation."""
    c = _t(spark, sf_dir, "customer").select(F.lit("customer").alias("src"))
    s = _t(spark, sf_dir, "supplier").select(F.lit("supplier").alias("src"))
    return c.unionAll(s).groupBy("src").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# Scalar function batteries
# --------------------------------------------------------------------------

@register(
    "scalar_string_battery",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           CAST(length(c_name) AS INTEGER)                 AS name_len,
           substr(c_name, 10, 6)                           AS name_mid,
           replace(c_name, 'Customer', 'C')                AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')       AS key_padded,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           reverse(c_mktsegment)                           AS seg_rev,
           CAST(strpos(c_name, '#') AS INTEGER)            AS hash_pos
    FROM customer
    """,
    category="relational",
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery mirroring reference F2/F9 text manipulation
    (restaurant_etl/models/menu_models.py:64-68, process_menu.py:43)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 6).alias("name_mid"),
        F.regexp_replace("c_name", "Customer", "C").alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.instr("c_name", "#").alias("hash_pos"),
    )


@register(
    "scalar_date_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS order_year,
           CAST(month(o_orderdate) AS INTEGER)   AS order_month,
           CAST(day(o_orderdate) AS INTEGER)     AS order_day,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start
    FROM orders
    """,
    category="relational",
)
def scalar_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery (reference F11 analog, process_menu.py:91)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
    )


@register(
    "scalar_math_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)        AS disc_dev,
           ceil(l_extendedprice)                   AS price_ceil,
           floor(l_extendedprice)                  AS price_floor,
           round(sqrt(l_quantity), 6)              AS qty_sqrt,
           round(ln(l_extendedprice), 6)           AS price_ln,
           round(power(l_quantity, 2), 1)          AS qty_sq,
           l_partkey % 7                           AS partkey_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    category="relational",
)
def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (reference F10 analog, llm_parser.py:20-21)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_quantity", 2), 1).alias("qty_sq"),
        (F.col("l_partkey") % 7).alias("partkey_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(length(props) AS INTEGER)                     AS props_len
    FROM events
    """,
    category="relational",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column (reference's
    from_json surface, SURVEY §1.3 layer-1 analog)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.length("props").alias("props_len"),
    )


@register(
    "case_when_bands",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS band,
           count(*) AS n_orders,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1
    """,
    category="relational",
)
def case_when_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (reference F5 price_display branching analog)."""
    o = _t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.select(band.alias("band"), "o_totalprice")
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    category="relational",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (exact dedup on a projection — SURVEY §2B dedup row)."""
    return _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="relational",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts on status (explicit value list keeps the plan static)."""
    o = _t(spark, sf_dir, "orders")
    pivoted = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("P"),
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT s_nationkey AS k FROM supplier
    """,
    category="relational",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): duplicate keys survive up to the
    minimum multiplicity on either side."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("k")
    )
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s)


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
    category="relational",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each F-status occurrence cancels one
    O-status occurrence of the same customer key."""
    a = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    b = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    return a.exceptAll(b)


@register(
    "agg_statistical_battery",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)               AS qty_stddev,
           round(var_samp(l_quantity), 4)                  AS qty_var,
           round(stddev_pop(l_discount), 6)                AS disc_stddev_pop,
           round(corr(l_quantity, l_extendedprice), 6)     AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 6)    AS qty_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="relational",
)
def agg_statistical_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample/population stddev and variance,
    correlation, covariance — single-pass merge-able sketches (Welford),
    the profiling primitives for 100 TB data-quality scans."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.stddev_pop("l_discount"), 6).alias("disc_stddev_pop"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
    )


@register(
    "window_pct_rank_ntile_nth",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           round(percent_rank() OVER w, 6)        AS pct_rank,
           round(cume_dist() OVER w, 6)           AS cume,
           round(nth_value(s_acctbal, 2) OVER (PARTITION BY s_nationkey
                 ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_bal
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    category="relational",
)
def window_pct_rank_ntile_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value — the remaining ranking
    analytics over a deterministic total order."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.nth_value("s_acctbal", 2).over(w_full), 2).alias("second_bal"),
    )


@register(
    "timeseries_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
               CAST(date_trunc('day', max(ts)) AS DATE) AS d1
        FROM events WHERE user_id < 10 GROUP BY user_id
    ),
    spine AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n, round(sum(value), 2) AS v
        FROM events WHERE user_id < 10 GROUP BY 1, 2
    )
    SELECT s.user_id, s.day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           coalesce(d.v, 0.0) AS total_value
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    category="relational",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: per-user daily date spine (sequence +
    explode between min/max day) left-joined to daily aggregates, zeros for
    missing days — the densification primitive for downstream window math.
    The spine is generated per key (narrow after one bounds agg), never a
    global calendar cross join. Daily per-user value sums stay double
    (r13 sweep: ≤ ~10^4 magnitude, never near the unstable regime)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    daily = (
        e.groupBy("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("d0"),
        F.date_trunc("day", F.max("ts")).cast("date").alias("d1"),
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("v", F.lit(0.0)).alias("total_value"),
        )
    )
