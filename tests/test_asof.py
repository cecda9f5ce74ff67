"""Unit tests for the union+window as-of join (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from restaurant_etl_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 12:00:00")), (2, _ts("2024-01-01 09:00:00"))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (2, _ts("2024-01-01 09:30:00"), 99.0),  # after left's only row
        ],
        "k int, rts timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", value_cols=["v"])
    got = {(r.k, r.ts.isoformat(), r.v) for r in out.collect()}
    assert got == {
        (1, "2024-01-01T10:00:00", 10.0),
        (1, "2024-01-01T12:00:00", 20.0),
        (2, "2024-01-01T09:00:00", None),  # no right row at-or-before
    }


def test_asof_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 5.0), (1, _ts("2024-01-01 09:00:00"), 1.0)],
        "k int, rts timestamp, v double",
    )
    inc = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", value_cols=["v"], inclusive=True)
    assert inc.collect()[0].v == 5.0  # equal-ts row visible
    strict = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", value_cols=["v"], inclusive=False)
    assert strict.collect()[0].v == 1.0  # equal-ts row excluded


def test_asof_no_shuffle_explosion(spark):
    """Plan must be window-based (one exchange on the key), not a non-equi join."""
    left = spark.range(100).select(F.col("id").alias("k"), F.lit(1000).cast("timestamp").alias("ts"))
    right = spark.range(100).select(F.col("id").alias("k"), F.lit(500).cast("timestamp").alias("rts"),
                                    F.lit(1.0).alias("v"))
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
