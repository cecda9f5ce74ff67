"""The remaining TPC-H query shapes (SURVEY.md §2B relational surface),
adapted to the driver's column subset like tpch_more.py (no partsupp table,
no receipt/commit dates — the join/agg/subquery SHAPES are preserved, the
missing columns substituted from what exists).

Scale notes common to all: dimension sides (nation, region, per-group
aggregates with bounded cardinality) are broadcast explicitly; fact-fact
joins shuffle on their keys with AQE free to re-plan; every filter is
expressed on the scanned column so it reaches the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.functions.money import (
    QTY_DEC,
    SQL_DISC_PRICE,
    disc_price,
    disc_price_units,
    frac,
    money,
    sum_money,
    sum_money_grid,
    sum_split_round2,
    sum_units_split,
)
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# revenue terms ride the exact decimal grid (functions/money.py) so group
# sums agree with the DuckDB oracle at every scale factor by construction
_rev = disc_price


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(round(sum({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey < 3 AND cn.n_nationkey < 3
      AND sn.n_nationkey <> cn.n_nationkey
    GROUP BY 1, 2, 3
    """,
    category="relational",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year —
    a 5-way join where both nation dims broadcast and the cross-nation
    asymmetry filter prunes before the aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 3)
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .withColumn("_rev4", disc_price_units())
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(*sum_units_split("_rev4", 4, "_rev"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            sum_split_round2("_rev_d", "_rev_m", 4, "revenue"),
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_rev AS (
        SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {SQL_DISC_PRICE} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    )
    SELECT l_year,
           round(CAST(sum(CASE WHEN supp_nation = 'BRAZIL' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM all_rev GROUP BY l_year
    """,
    category="relational",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region by year —
    an 8-way star join (two nation roles) feeding a conditional-ratio
    aggregate. Region/nation broadcast; the two fact joins shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("l_shipdate").alias("l_year"), _rev().alias("volume"), "supp_nation")
    )
    brazil = F.when(F.col("supp_nation") == "BRAZIL", F.col("volume")).otherwise(F.lit(0))
    return vol.groupBy("l_year").agg(
        F.round(
            F.sum(brazil).cast("double") / F.sum("volume").cast("double"), 4
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
           CAST(round(sum({SQL_DISC_PRICE}
                     - CAST(0.4 * p_retailprice AS DECIMAL(16,3))
                       * CAST(l_quantity AS DECIMAL(8,2))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE contains(p_name, 'red')
    GROUP BY 1, 2
    """,
    category="relational",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation profit on a part-name-filtered product
    line by year ('red' parts — the testdata color vocabulary has no
    'green'). No ps_supplycost in this dataset, so cost is modeled as
    0.4 × retail price — the join/agg shape (fact ⋈ filtered part ⋈
    supplier ⋈ nation, two-key groupBy) is what's exercised."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    profit = _rev() - (0.4 * F.col("p_retailprice")).cast("decimal(16,3)") * F.col(
        "l_quantity"
    ).cast(QTY_DEC)
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(sum_money(profit, "sum_profit"))
    )


@register(
    "q11_important_balances",
    oracle="""
    WITH by_nation AS (
        SELECT n_name,
               CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS nation_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name, nation_bal
    FROM by_nation
    WHERE nation_bal > (SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(12,2)))
                                    AS DOUBLE) * 0.03 FROM supplier)
    """,
    category="relational",
)
def q11_important_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose share exceeds a GLOBAL-scalar-subquery
    threshold (HAVING vs an uncorrelated aggregate). No partsupp in this
    dataset, so supplier balances stand in for stock value; the two-pass
    plan (grouped agg ⋈ broadcast global scalar) is the point."""
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    by_nation = (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum_money_grid("s_acctbal", "nation_bal"))
    )
    # threshold on the same exact grid so the filter boundary can't
    # drift with summation order (r13 money-grid sweep)
    threshold = s.agg(
        (sum_money_grid("s_acctbal", "_g") * 0.03).alias("threshold")
    )
    return (
        by_nation.join(F.broadcast(threshold))
        .filter(F.col("nation_bal") > F.col("threshold"))
        .select("n_name", "nation_bal")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    category="relational",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over customers INCLUDING the
    zero-order ones (left outer join, count of the nullable key, then a
    second aggregate over the first's result)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum({SQL_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    category="relational",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: quarterly revenue view, then suppliers hitting the view's
    max (uncorrelated scalar subquery over a derived table — the derived
    table is computed once and reused for both the max and the join)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        sum_money(_rev(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    category="relational",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group with a
    NOT IN exclusion subquery (anti join against the complaint suppliers;
    lineitem bridges part↔supplier since this dataset has no partsupp)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    l = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avg_qty ON l_partkey = pk
    WHERE p_brand = 'Brand#2' AND l_quantity < half_avg
    """,
    category="relational",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below a per-group correlated average
    (decorrelated into a grouped-agg join, no per-row re-execution). Both
    engines compute half_avg with IEEE double division, so the < predicate
    selects identical rows."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_qty = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.count("*").alias("n_small"),
            sum_money_grid("l_extendedprice", "total_price"),
        )
    )


@register(
    "q20_excess_shippers",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey AS pk, 0.5 * sum(l_quantity) AS half_total
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey
    ),
    per_supp_part AS (
        SELECT l_suppkey AS sk, l_partkey AS pk, sum(l_quantity) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT sk FROM per_supp_part JOIN per_part USING (pk)
        WHERE supp_qty > half_total
    )
    """,
    category="relational",
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half a part's total
    yearly volume (nested grouped aggregates → semi join). partsupp's
    availqty is substituted by shipped quantity; the two-level aggregate +
    IN-subquery decorrelation is the exercised shape."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.sum("l_quantity")).alias("half_total")
    )
    per_supp_part = l.groupBy(
        F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk2")
    ).agg(F.sum("l_quantity").alias("supp_qty"))
    excess = (
        per_supp_part.join(per_part, F.col("pk2") == F.col("pk"))
        .filter(F.col("supp_qty") > F.col("half_total"))
        .select("sk")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(excess, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE epoch_us(l_shipdate) - epoch_us(o_orderdate) > CAST(90 AS BIGINT) * 86400 * 1000000
    ),
    all_supps AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, count(*) AS numwait
    FROM (
        SELECT DISTINCT late.l_orderkey, late.l_suppkey
        FROM late
        WHERE EXISTS (SELECT 1 FROM all_supps a
                      WHERE a.l_orderkey = late.l_orderkey
                        AND a.l_suppkey <> late.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l2
                          WHERE l2.l_orderkey = late.l_orderkey
                            AND l2.l_suppkey <> late.l_suppkey)
    ) waiters
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    category="relational",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier-in-a-multi-supplier-order
    pattern. No receipt/commit dates in this dataset: "late" = shipped
    >90 days after the order date.

    Single-aggregation rewrite (VERDICT r3 #6): instead of EXISTS/NOT
    EXISTS as a semi + anti double pass over lineitem (two wide joins),
    aggregate per order — distinct supplier count, distinct LATE supplier
    count, and the late supplier's key — then keep orders with >1
    supplier and exactly 1 late one. max(late_supp) is well-defined
    because the filter pins n_late = 1.

    Shaped to avoid Expand: two countDistinct in one agg would triple the
    pre-shuffle row count, so instead aggregate to (order, supplier)
    granularity with bool_or(late) first (partial aggregation collapses
    rows map-side), then count per order. The second shuffle keys a
    strictly smaller relation. At 100 TB this halves lineitem traffic vs
    the join-based form; no row multiplication anywhere."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    is_late = (
        F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        > 90 * 86400 * 1_000_000
    )
    per_pair = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late.cast("int")).alias("late"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("waiter_suppkey"),
    )
    waiters = per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
    s = _t(spark, sf_dir, "supplier")
    return (
        waiters.join(s, F.col("waiter_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
