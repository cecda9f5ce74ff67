"""Structured Streaming surface: file-stream sources, watermarked windowed
aggregations, session windows, streaming dedup, foreachBatch sinks."""

from restaurant_etl_spark.streaming.jobs import (  # noqa: F401
    dedup_within_watermark,
    enrich_with_customers,
    events_file_stream,
    run_available_now,
    session_agg,
    sliding_counts,
    stage_events_source,
    tumbling_counts,
    view_purchase_interval_join,
)
