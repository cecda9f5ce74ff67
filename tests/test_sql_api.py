"""SQL-API surface: parameterized queries (named + positional binds) and
the IDENTIFIER() clause — the injection-safe way a 100 TB deployment
templates queries per tenant/table instead of f-string SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.sources.tables import load_table


def _orders_view(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")


def test_named_parameter_binding(spark, sf_dir):
    _orders_view(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS n FROM orders_v WHERE o_totalprice > :floor AND o_orderstatus = :st",
        args={"floor": 100000.0, "st": "O"},
    ).collect()[0]["n"]
    expect = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_totalprice") > 100000.0) & (F.col("o_orderstatus") == "O"))
        .count()
    )
    assert got == expect > 0


def test_positional_parameter_binding(spark, sf_dir):
    _orders_view(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS n FROM orders_v WHERE o_orderpriority = ? AND o_totalprice < ?",
        args=["1-URGENT", 50000.0],
    ).collect()[0]["n"]
    expect = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 50000.0))
        .count()
    )
    assert got == expect > 0


def test_identifier_clause_templated_table_and_column(spark, sf_dir):
    """IDENTIFIER() binds a parameter into a NAME position (table/column)
    safely — string interpolation there is the classic injection hole."""
    _orders_view(spark, sf_dir)
    got = spark.sql(
        "SELECT round(sum(IDENTIFIER(:col)), 2) AS s FROM IDENTIFIER(:tab) WHERE o_orderkey % 10 = 0",
        args={"col": "o_totalprice", "tab": "orders_v"},
    ).collect()[0]["s"]
    expect = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
        .collect()[0]["s"]
    )
    assert got == expect


def test_parameter_is_data_not_sql(spark, sf_dir):
    """A malicious parameter value stays a VALUE: no injection through
    binds (the reason args beats f-strings)."""
    _orders_view(spark, sf_dir)
    evil = "O' OR '1'='1"
    got = spark.sql(
        "SELECT count(*) AS n FROM orders_v WHERE o_orderstatus = :st",
        args={"st": evil},
    ).collect()[0]["n"]
    assert got == 0  # no status equals the literal injection string
