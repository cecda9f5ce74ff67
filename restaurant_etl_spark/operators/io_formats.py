"""Columnar/text format round-trips: the engine must read what it writes
(CSV with headers, JSON lines) with explicit schemas — the non-parquet
source surface (SURVEY §2A S7/S8 read side). Staged once per sf_dir under
the system temp dir; oracles read the original parquet, so a lossy
write/read would hash-mismatch."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.staging import source_fingerprint, stage_once
from restaurant_etl_spark.sources.tables import load_table


def _stage(spark: SparkSession, sf_dir: str, table: str, fmt: str) -> str:
    def build(scratch: str) -> None:
        out = os.path.join(scratch, "data")
        w = load_table(spark, sf_dir, table).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(out)
        else:
            w.json(out)

    base = stage_once(
        f"io_{fmt}_{table}_{os.path.basename(os.path.normpath(sf_dir))}",
        source_fingerprint(os.path.join(sf_dir, f"{table}.parquet")),
        build,
    )
    return os.path.join(base, "data")


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
    category="relational",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV source with an explicit schema (no inference job at
    scale) → aggregate; must equal the same aggregate on the parquet
    original. Doubles as a float-formatting fidelity check."""
    path = _stage(spark, sf_dir, "customer", "csv")
    schema = load_table(spark, sf_dir, "customer").schema
    back = spark.read.schema(schema).option("header", True).csv(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("total_bal")
    )


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT s_nationkey, count(*) AS n, round(max(s_acctbal), 2) AS max_bal
    FROM supplier GROUP BY s_nationkey
    """,
    category="relational",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → source round-trip with explicit schema."""
    path = _stage(spark, sf_dir, "supplier", "json")
    schema = load_table(spark, sf_dir, "supplier").schema
    back = spark.read.schema(schema).json(path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"), F.round(F.max("s_acctbal"), 2).alias("max_bal")
    )
