"""Event-sequence analytics over the events table: conversion funnels and
retention cohorts — the product-analytics query family (complements the
windowing/sessionization surface in operators/streaming_batch.py).

Both are single-aggregation shapes: per-user stage timestamps or cohort
dates reduce map-side, then one small shuffle on user_id / cohort keys —
the same plan at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH stages AS (
        SELECT e.user_id,
               min(CASE WHEN e.event_type = 'view' THEN e.ts END) AS t_view
        FROM events e GROUP BY e.user_id
    ),
    clicks AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN stages s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.t_view
        GROUP BY e.user_id
    ),
    purchases AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN clicks c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT
        (SELECT count(*) FROM stages WHERE t_view IS NOT NULL) AS n_viewed,
        (SELECT count(*) FROM clicks) AS n_clicked_after_view,
        (SELECT count(*) FROM purchases) AS n_purchased_after_click
    """,
    category="events",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked AFTER the
    first view, then purchased AFTER that first qualifying click. Each stage
    is a per-user min over a filtered event set — three key-partitioned
    aggregations that AQE pipelines; no window over raw events, no
    event-by-event state."""
    e = _events(spark, sf_dir)
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        views.agg(F.count("*").alias("n_viewed"))
        .crossJoin(clicks.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(purchases.agg(F.count("*").alias("n_purchased_after_click")))
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INTEGER) AS day_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    category="events",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by first-seen day, activity counted
    per (cohort, day-offset). The cohort table is one aggregation on
    user_id; the triangle is one more on (cohort_day, offset) with a
    distinct-user count — both partial-aggregated map-side. The cohort
    join key is user_id, so no re-shuffle between the two stages."""
    e = _events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    return (
        e.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
