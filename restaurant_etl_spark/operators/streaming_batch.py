"""Batch-SQL equivalents of the streaming operator surface (SURVEY.md §2B)
over the ``events`` table — tumbling / sliding / session windows and
in-window dedup — oracle-checked against DuckDB. The genuinely streaming
implementations (watermarks, state, availableNow triggers) live in
:mod:`restaurant_etl_spark.streaming` and are semantics-tested in
tests/test_streaming.py; these batch twins define their expected output.

Money-grid note (r13 sweep): the windowed ``sum(value)`` totals here stay
on doubles deliberately — every sum is per (time-window, key) and the
event-time windows keep group magnitude bounded by the window's row count
(~10^4 rows × ~245 ≈ 10^6-10^7 even at sf100), five decades under the
~10^12 regime where double summation loses the cents digit. Grand totals
over whole tables are the unstable pattern; none exist in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "stream_tumbling_window_batch",
    oracle="""
    SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS win_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type — the batch twin
    of ``groupBy(window(ts, '10 minutes'), event_type)``."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


@register(
    "stream_sliding_window_batch",
    oracle="""
    SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000 - off * 1000000) AS win_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events CROSS JOIN (VALUES (0), (300)) k(off)
    GROUP BY 1
    """,
    category="streaming",
)
def stream_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute slide (every event lands
    in exactly two windows) — batch twin of ``window(ts, '10m', '5m')``."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


@register(
    "stream_session_windows_batch",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_MIN} * 60000000
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM g
    )
    SELECT user_id, CAST(session_no AS INTEGER) AS session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM s
    GROUP BY user_id, session_no
    """,
    category="streaming",
)
def stream_session_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag → new-session
    flag → running sum = session number → per-session aggregate. Batch twin
    of ``session_window(ts, '30 minutes')``; two shuffles on user_id."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60_000_000
    # >= gap starts a NEW session, matching native session_window exactly:
    # per-event windows are [ts, ts+gap) and merge only on OVERLAP, so an
    # event landing exactly gap after its predecessor does not merge.
    g = e.withColumn(
        "is_new",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) >= gap_us)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wc = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    s = g.withColumn("session_no", F.sum("is_new").over(wc).cast("int"))
    return s.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "stream_dedup_in_window_batch",
    oracle="""
    SELECT user_id, event_type,
           make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS win_start,
           min(ts) AS first_ts,
           count(*) AS n_suppressed
    FROM events
    GROUP BY user_id, event_type, 3
    """,
    category="streaming",
)
def stream_dedup_in_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup: keep the first event per (user, type, 10-min window),
    counting suppressed duplicates — batch twin of
    ``dropDuplicatesWithinWatermark`` keyed on (user_id, event_type, window)."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        "user_id", "event_type", F.window("ts", "10 minutes").alias("w")
    ).agg(F.min("ts").alias("first_ts"), F.count("*").alias("n_suppressed")).select(
        "user_id", "event_type", F.col("w.start").alias("win_start"), "first_ts", "n_suppressed"
    )


_INTERVAL_JOIN_ORACLE = """
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.ts AS view_ts,
           p.ts AS purchase_ts,
           CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT) AS lag_sec,
           round(p.value, 2) AS purchase_value
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """

_ENRICH_ORACLE = """
    SELECT e.event_id,
           e.user_id,
           c.c_name AS customer_name,
           c.c_mktsegment AS segment,
           e.event_type,
           e.ts,
           round(e.value, 2) AS value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """


@register("stream_stream_interval_join_batch", oracle=_INTERVAL_JOIN_ORACLE, category="streaming")
def stream_stream_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: views paired with the
    same user's purchases within 30 minutes after the view. In batch form
    this is one shuffle on user_id with the time bound applied inside the
    join; in streaming form the same bound limits buffered state."""
    from restaurant_etl_spark.streaming import view_purchase_interval_join

    e = _events(spark, sf_dir)
    return view_purchase_interval_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )


@register("stream_stream_interval_join_live", oracle=_INTERVAL_JOIN_ORACLE, category="streaming")
def stream_stream_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL stream-stream join oracle-checked end-to-end: two watermarked
    file-stream replays of events (views / purchases) joined on user_id with
    an event-time bound, drained append-mode with availableNow. Inner-join
    rows emit eagerly, so the drain yields the complete pair set; watermarks
    bound the buffered state the whole time."""
    import os as _os

    from restaurant_etl_spark.streaming import (
        events_file_stream,
        run_available_now,
        stage_events_source,
        view_purchase_interval_join,
    )

    src = stage_events_source(spark, sf_dir)
    views = events_file_stream(spark, src).filter(F.col("event_type") == "view")
    purchases = events_file_stream(spark, src).filter(F.col("event_type") == "purchase")
    table = "ssjoin_live_" + _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    run_available_now(view_purchase_interval_join(views, purchases), table, "append")
    return spark.table(table)


@register("stream_static_enrich_batch", oracle=_ENRICH_ORACLE, category="streaming")
def stream_static_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of stream-static enrichment: every event joined to the
    broadcast customer dimension (user_id = c_custkey) — map-side, zero
    shuffle, zero streaming state."""
    from restaurant_etl_spark.sources.tables import load_table as _lt
    from restaurant_etl_spark.streaming import enrich_with_customers

    return enrich_with_customers(_events(spark, sf_dir), _lt(spark, sf_dir, "customer"))


@register("stream_static_enrich_live", oracle=_ENRICH_ORACLE, category="streaming")
def stream_static_enrich_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL stream-static broadcast enrichment drained with availableNow:
    the static dimension is re-resolved per micro-batch (the
    slowly-changing-dimension deployment pattern), the stream side never
    shuffles."""
    import os as _os

    from restaurant_etl_spark.sources.tables import load_table as _lt
    from restaurant_etl_spark.streaming import (
        enrich_with_customers,
        events_file_stream,
        run_available_now,
        stage_events_source,
    )

    src = stage_events_source(spark, sf_dir)
    stream = events_file_stream(spark, src)
    table = "enrich_live_" + _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    run_available_now(
        enrich_with_customers(stream, _lt(spark, sf_dir, "customer")), table, "append"
    )
    return spark.table(table)


@register(
    "stream_tumbling_window_live",
    oracle="""
    SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS win_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    category="streaming",
)
def stream_tumbling_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL Structured Streaming execution oracle-checked end-to-end:
    replay events as a file stream, watermarked tumbling-window aggregate,
    drain with availableNow into a memory sink, return the drained table.
    Proves the streaming path computes exactly the batch/DuckDB answer."""
    import os as _os

    from restaurant_etl_spark.streaming import (
        events_file_stream,
        run_available_now,
        stage_events_source,
        tumbling_counts,
    )

    src = stage_events_source(spark, sf_dir)
    table = "tumbling_live_" + _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    run_available_now(tumbling_counts(events_file_stream(spark, src)), table, "complete")
    return spark.table(table)


@register(
    "stream_session_windows_live",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {SESSION_GAP_MIN} * 60000000
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM g
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM s
    GROUP BY user_id, session_no
    """,
    category="streaming",
)
def stream_session_windows_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL Structured Streaming session windows oracle-checked: native
    ``session_window`` (30-minute gap) over the file-stream replay must
    carve exactly the sessions the lag/cumsum batch formulation defines."""
    import os as _os

    from restaurant_etl_spark.streaming import (
        events_file_stream,
        run_available_now,
        session_agg,
        stage_events_source,
    )

    src = stage_events_source(spark, sf_dir)
    table = "session_live_" + _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    run_available_now(session_agg(events_file_stream(spark, src)), table, "complete")
    return spark.table(table).select("user_id", "session_start", "n_events", "total_value")


@register(
    "stream_sliding_window_live",
    oracle="""
    SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000 - off * 1000000) AS win_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events CROSS JOIN (VALUES (0), (300)) k(off)
    GROUP BY 1
    """,
    category="streaming",
)
def stream_sliding_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL Structured Streaming sliding windows (10m length / 5m slide)
    oracle-checked via the availableNow drain."""
    import os as _os

    from restaurant_etl_spark.streaming import (
        events_file_stream,
        run_available_now,
        sliding_counts,
        stage_events_source,
    )

    src = stage_events_source(spark, sf_dir)
    table = "sliding_live_" + _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    run_available_now(sliding_counts(events_file_stream(spark, src)), table, "complete")
    return spark.table(table)


@register(
    "stream_stateful_running_totals_live",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    category="streaming",
)
def stream_stateful_running_totals_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL custom stateful operator oracle-checked end-to-end:
    ``applyInPandasWithState`` holds one (count, sum) pair per user across
    micro-batches and emits the updated changelog row each batch. After the
    availableNow drain, the LAST update per user (max n_events — counts are
    monotone) must equal the plain batch aggregate, however many
    micro-batches the replay took. Proves state survives batch boundaries
    with values identical to the declarative computation."""
    import os as _os

    from pyspark.sql.window import Window

    from restaurant_etl_spark.streaming import (
        events_file_stream,
        run_available_now,
        stage_events_source,
    )
    from restaurant_etl_spark.streaming.jobs import running_user_totals

    src = stage_events_source(spark, sf_dir)
    table = "stateful_live_" + _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    run_available_now(
        running_user_totals(events_file_stream(spark, src)), table, "append"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(table)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))
    )
