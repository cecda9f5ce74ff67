"""Additional TPC-H-shaped analytical queries (SURVEY.md §2B relational
surface), adapted to the driver's column subset: correlated subqueries,
disjunctive predicates, having-on-subquery, min-within-group joins, and a
hypertable-style multi-resolution rollup. All declarative — Catalyst picks
broadcast/SMJ and AQE re-plans at runtime."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.functions.money import (
    SQL_DISC_PRICE,
    disc_price,
    disc_price_units,
    sum_money,
    sum_money_grid,
    sum_split_round2,
    sum_units_split,
)
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cheapest AS (
        SELECT s_nationkey AS nk, min(s_acctbal) AS min_bal
        FROM supplier GROUP BY s_nationkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN cheapest c ON s.s_nationkey = c.nk AND s.s_acctbal = c.min_bal
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    category="relational",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-within-group then join back (the classic
    argmin-by-key pattern, no window needed — aggregate side is tiny)."""
    s = _t(spark, sf_dir, "supplier")
    cheapest = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.min("s_acctbal").alias("min_bal"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        s.join(F.broadcast(cheapest), (s.s_nationkey == cheapest.nk) & (s.s_acctbal == cheapest.min_bal))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-10-01')
    GROUP BY o_orderpriority
    """,
    category="relational",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: date-windowed orders with a late-shipping EXISTS
    (left-semi join on the pushed-filtered lineitem side)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-10-01").cast("timestamp"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q12_shipmode_buckets",
    oracle="""
    SELECT l_linestatus,
           CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT)
               AS high_line_count,
           CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT)
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    category="relational",
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional priority bucketing."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_pct",
    oracle=f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                  THEN {SQL_DISC_PRICE} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({SQL_DISC_PRICE}) AS DOUBLE), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    category="relational",
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate ratio
    over a month of shipments."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = disc_price()
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           round(q.total_qty, 2)  AS total_qty
    FROM orders
    JOIN big ON o_orderkey = big.l_orderkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem GROUP BY l_orderkey) q
      ON o_orderkey = q.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    category="relational",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as a join input (large
    volume orders and their customers)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    qty = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("total_qty"))
    big = qty.filter(F.col("total_qty") > 150)
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(round(sum({SQL_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    category="relational",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-way disjunctive join residual (tests
    CNF-conversion/pushdown of OR predicates)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        j.filter(cond)
        .withColumn("_rev4", disc_price_units())
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
    "q22_balance_outliers",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, count(*) AS n_rich,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    category="relational",
)
def q22_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global avg broadcast) +
    anti join (customers with no orders since 2000)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_rich"), sum_money_grid("c_acctbal", "total_bal"))
    )


@register(
    "hypertable_rollup_cascade",
    oracle="""
    WITH m10 AS (
        SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS b10,
               event_type, count(*) AS n, sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    h1 AS (
        SELECT make_timestamp((epoch_us(b10) // 3600000000) * 3600000000) AS b1h,
               event_type, CAST(sum(n) AS BIGINT) AS n, sum(v) AS v
        FROM m10 GROUP BY 1, 2
    )
    SELECT b1h AS bucket_start, event_type, n AS n_events, round(v, 2) AS total_value
    FROM h1
    """,
    category="relational",
)
def hypertable_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup: raw events → 10-minute buckets →
    1-hour buckets, the coarse level re-aggregating the fine level's
    partials (count-sum / sum-sum) instead of rescanning raw data — the
    continuous-aggregate maintenance pattern at 100 TB."""
    e = _t(spark, sf_dir, "events")
    m10 = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").alias("b10"), "event_type", "n", "v")
    )
    h1 = (
        m10.groupBy(F.window("b10", "1 hour").alias("w"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n", "v")
    )
    return h1.select(
        "bucket_start", "event_type", F.col("n").alias("n_events"), F.round("v", 2).alias("total_value")
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    category="relational",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual key-salting: the fact side appends salt = hash(row)%8 to the
    join key; the dimension side explodes 8 salted copies. Same result as
    the plain join (the oracle), but a hot key's rows spread over 8
    reducers — the pre-AQE skew mitigation, kept alongside AQE's automatic
    skew-join splitting (session.py enables both)."""
    n_salts = 8
    l = _t(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.abs(F.hash("l_orderkey", "l_linenumber")) % n_salts)
    )
    o = _t(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), sum_money_grid("l_extendedprice", "total_price"))
    )


@register(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           (SELECT round(max(o_totalprice), 2) FROM orders
            WHERE o_custkey = c_custkey) AS max_order
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
    category="relational",
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL API — Catalyst
    decorrelates it into a left outer aggregate join (no per-row
    re-execution, unlike the naive nested-loop semantics)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT round(max(o_totalprice), 2) FROM orders
                WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE c_custkey % 10 = 0
        """
    )


@register("agg_freq_items_sketch", oracle=None, category="relational")
def agg_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters sketch (freqItems, single-pass Karp-style counting) —
    the 100 TB path for approximate top-k without a full groupBy; results
    are sketch-dependent so rows-only, but semantically bounded: the output
    is a SUPERSET of every value whose true frequency exceeds support=0.1
    (false positives allowed, false negatives never), enforced by
    tests/test_sketch_bounds.py. Array outputs are serialized to
    sorted CSV strings — the driver's canonicalizer cannot hash lists."""
    o = _t(spark, sf_dir, "orders")
    fi = o.freqItems(["o_orderpriority", "o_orderstatus"], support=0.1)
    return fi.select(
        F.array_join(F.array_sort("o_orderpriority_freqItems"), ",").alias(
            "priority_freq_csv"
        ),
        F.array_join(F.array_sort("o_orderstatus_freqItems"), ",").alias(
            "status_freq_csv"
        ),
    )
