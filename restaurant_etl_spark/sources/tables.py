"""Loaders for the driver's synthetic star schema (TESTDATA.md).

Parquet scans are the canonical input path: columnar, predicate-pushdown and
column-pruning friendly. Nothing here collects or caches — callers compose
lazily so Catalyst sees the whole plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any scale factor —
#: region/nation are bounded by geography (25/5 rows in TPC-H) regardless of SF.
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # oracle parity must hold even under a caller-provided vanilla session
    # (the driver builds its own SparkSession): timestamps are tz-naive in
    # the parquet files, so pin the session to UTC like DuckDB.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize events.ts to TIMESTAMP for every physical encoding the driver
    has shipped so far:

    - parquet TIMESTAMP(NANOS): Spark's reader rejects it outright, so read
      nanos as LONG (legacy conf) and truncate to microseconds — exactly what
      DuckDB does when it surfaces the column as TIMESTAMP (µs);
    - parquet µs tz-naive: Spark ≥4 reads it as TIMESTAMP_NTZ, which breaks
      ``unix_micros`` and streaming ``withWatermark``; cast to TIMESTAMP —
      value-identical under the UTC session pinned in ``load_table``;
    - parquet µs UTC-adjusted: already TIMESTAMP, pass through.

    Downstream code can therefore assume ``ts`` is always ``timestamp``."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so ``spark.sql`` queries mirror the
    DuckDB oracle's pre-registered views one-to-one."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
