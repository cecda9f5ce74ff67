"""Python Data Source API (sources/pyds.py): partition planning, filter
pushdown into the partition plan, and value correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.sources.pyds import corpus_row, register_once


def _read(spark, **opts):
    register_once(spark)
    r = spark.read.format("menu_corpus")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_rows_match_closed_form(spark):
    got = {r["doc_id"]: tuple(r) for r in _read(spark, n_docs=40).collect()}
    assert len(got) == 40
    for i in range(40):
        assert got[i] == corpus_row(i)


def test_partition_planning(spark):
    df = _read(spark, n_docs=1000, rows_per_partition=100)
    assert df.rdd.getNumPartitions() == 10


def test_filter_pushdown_prunes_partitions(spark):
    """doc_id range predicates must be ABSORBED into the partition plan:
    [300, 500) at 100 rows/partition plans 2 partitions, not 10 — the
    pruned ranges are never generated at all."""
    df = _read(spark, n_docs=1000, rows_per_partition=100).filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 500)
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 2


def test_unsupported_filters_still_correct(spark):
    """A predicate pushFilters declines (category equality) is re-applied
    by Spark post-scan — over-claiming is impossible by construction."""
    df = _read(spark, n_docs=400).filter(
        (F.col("category") == "Mains") & (F.col("doc_id") >= 100)
    )
    rows = df.collect()
    assert {r["category"] for r in rows} == {"Mains"}
    assert len(rows) == 75  # doc_id % 4 == 1 in [100, 400)
    assert min(r["doc_id"] for r in rows) == 101


def test_stream_reader_no_dup_no_loss_across_restart(spark, tmp_path):
    """The streaming half of the Python Data Source: drain the 300-doc
    feed in two runs — the first stopped mid-stream — and prove the
    checkpointed offsets resume with no duplicate and no missing doc_id."""
    import time

    from restaurant_etl_spark.sources.pyds import register_once

    register_once(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.format("menu_corpus")
            .option("n_docs", "300")
            .option("rows_per_batch", "50")
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    def rows_in_sink() -> int:
        try:
            return spark.read.parquet(sink).count()
        except Exception:  # noqa: BLE001 - sink dir not created yet
            return 0

    q = start()
    deadline = time.time() + 120
    while rows_in_sink() < 100 and time.time() < deadline:
        time.sleep(0.3)
    q.stop()  # kill mid-stream (some batches committed, feed unfinished)
    assert rows_in_sink() >= 50, "first run never committed a batch"

    q = start()  # resume from the checkpointed offset
    deadline = time.time() + 120
    while rows_in_sink() < 300 and time.time() < deadline:
        time.sleep(0.3)
    q.stop()

    ids = [r.doc_id for r in spark.read.parquet(sink).select("doc_id").collect()]
    assert len(ids) == 300, f"expected 300 rows, got {len(ids)}"
    assert sorted(ids) == list(range(300)), "duplicate or missing doc_ids"
