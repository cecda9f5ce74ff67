"""Tests for the binary source surface (S1-S6), multimodal column plumbing,
and the CSV sink contract (S7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from restaurant_etl_spark.schemas import OUTPUT_COLUMNS
from restaurant_etl_spark.sources.binary import (
    extract_binary_text,
    read_binary_dir,
    with_format,
)
from restaurant_etl_spark.sources.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
)
from restaurant_etl_spark.sources.sinks import (
    timestamped_output_path,
    write_menu_csv,
    write_menu_csv_timestamped,
)

MENU_TXT = "SNACKS\nSamosa ... $5.00\nTea $2.00\n"


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    (d / "menu_a.txt").write_text(MENU_TXT)
    (d / "scan_b.pdf").write_bytes(b"%PDF-1.4 fake content for stub")
    (d / "photo_c.JPG").write_bytes(b"\xff\xd8\xff fake jpeg bytes")
    (d / "weird_d.xyz").write_bytes(b"????")
    return str(d)


def test_binary_scan_and_routing(spark, doc_dir):
    df = with_format(read_binary_dir(spark, doc_dir))
    got = {r["path"].split("/")[-1]: (r["format"], r["supported"]) for r in df.collect()}
    assert got["menu_a.txt"] == ("txt", True)
    assert got["scan_b.pdf"] == ("pdf", True)
    assert got["photo_c.JPG"] == ("jpg", True)  # case-insensitive suffix (S1)
    assert got["weird_d.xyz"] == ("xyz", False)


def test_extraction_paths(spark, doc_dir):
    df = extract_binary_text(with_format(read_binary_dir(spark, doc_dir)))
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    # native text path decodes exactly
    txt = rows["menu_a.txt"]
    assert txt["text"] == MENU_TXT and txt["success"] and txt["extraction_method"] == "native_text"
    assert txt["char_count"] == len(MENU_TXT)
    # stubbed pdf/image path: deterministic fake text, flagged method
    pdf = rows["scan_b.pdf"]
    # short stub text trips the S4 OCR-fallback threshold (<60 chars)
    assert pdf["success"] and pdf["extraction_method"] == "pdf_ocr_fallback"
    assert "STUB pdf" in pdf["text"]
    jpg = rows["photo_c.JPG"]
    assert jpg["success"] and "STUB image" in jpg["text"]
    # unsupported format → success=false with error (universal_extractor.py:26-48)
    bad = rows["weird_d.xyz"]
    assert not bad["success"] and bad["error"] == "Unsupported file format: .xyz"


def test_extraction_is_deterministic(spark, doc_dir):
    df = extract_binary_text(with_format(read_binary_dir(spark, doc_dir)))
    a = sorted((r["path"], r["text"]) for r in df.collect())
    b = sorted((r["path"], r["text"]) for r in df.collect())
    assert a == b


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x01\x02\x03\x04" * 64, (32, 16, None, "raw")),
        (2, "image", b"\xff\xee\xdd" * 100, (64, 64, None, "raw")),
        (3, "video", b"\x00\x01" * 500, (None, None, 3000, "fakecodec")),
        (4, "audio", b"\x7f\x80" * 200, (None, None, 2000, "pcm")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_shape_and_norm(media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert set(feats) == {1, 2, 3, 4}
    for r in feats.values():
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(x * x for x in r["features"]) - 1.0) < 1e-5  # unit norm
    assert feats[1]["n_bytes"] == 256


def test_resize_only_images(media):
    thumbs = resize_images(media).collect()
    assert {r["media_id"] for r in thumbs} == {1, 2}
    for r in thumbs:
        assert isinstance(r["thumb"], (bytes, bytearray)) and len(r["thumb"]) > 0


def test_frame_sampling_respects_duration(media):
    frames = sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_id) == {3}  # only video rows
    assert sorted(by_id[3]) == [0, 1, 2]  # 3000ms / 1000ms


def test_csv_sink_contract(spark, tmp_path):
    items = spark.createDataFrame(
        [("Samosa", "Snacks", 5.0, "$5.00", "$")],
        "item_name string, category string, price double, price_display string, currency string",
    )
    out = str(tmp_path / "csv_out")
    write_menu_csv(items, out)
    import glob

    files = glob.glob(out + "/part-*.csv")
    assert len(files) == 1  # single-file contract (process_menu.py:93)
    header = open(files[0]).readline().strip().split(",")
    assert header == OUTPUT_COLUMNS  # 13 columns, canonical order
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 1


def test_timestamped_output_filename(spark, tmp_path):
    """F11 — {stem}_extracted_{yyyyMMdd_HHmmss}.csv (process_menu.py:91-92)."""
    import re

    # injectable timestamp: deterministic path
    p = timestamped_output_path(str(tmp_path), "great_india", "20240101_120000")
    assert p == str(tmp_path / "great_india_extracted_20240101_120000.csv")

    # default: one driver-side timestamp in the reference's exact format
    p2 = timestamped_output_path(str(tmp_path), "menu")
    assert re.fullmatch(
        r"menu_extracted_\d{8}_\d{6}\.csv", p2.rsplit("/", 1)[1]
    )

    items = spark.createDataFrame(
        [("Samosa", "Snacks", 5.0, "$5.00", "$")],
        "item_name string, category string, price double, price_display string, currency string",
    )
    written = write_menu_csv_timestamped(
        items, str(tmp_path), "great_india", timestamp="20240101_120000"
    )
    assert written.endswith("great_india_extracted_20240101_120000.csv")
    assert spark.read.option("header", True).csv(written).count() == 1


# ---------------------------------------------------------------------------
# Environment-drift guard (VERDICT r3 §next #3): the driver has shipped
# events.ts in three physical parquet encodings across rounds —
# TIMESTAMP(NANOS) (Spark reads bigint under nanosAsLong), µs tz-naive
# (Spark ≥4 reads TIMESTAMP_NTZ), and µs UTC-adjusted (plain TIMESTAMP).
# A regeneration or Spark upgrade must never silently break `unix_micros`
# or streaming `withWatermark` again: every encoding must normalize to
# TIMESTAMP at the loader, and the staged stream source must analyze.
# ---------------------------------------------------------------------------

_TS_ENCODINGS = ("ns_naive", "us_ntz", "us_utc")


def _write_events_fixture(path: str, encoding: str) -> None:
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = {
        "event_id": [1, 2, 3],
        "user_id": [10, 10, 11],
        "event_type": ["view", "click", "purchase"],
        "ts": [base, base + datetime.timedelta(minutes=5), base + datetime.timedelta(minutes=9)],
        "value": [1.0, 2.5, 9.9],
    }
    unit_tz = {
        "ns_naive": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "us_utc": pa.timestamp("us", tz="UTC"),
    }[encoding]
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts", unit_tz),
            ("value", pa.float64()),
        ]
    )
    tbl = pa.Table.from_pydict(rows, schema=schema)
    # version 2.6 preserves nanosecond timestamps as TIMESTAMP(NANOS)
    pq.write_table(tbl, path, version="2.6", coerce_timestamps=None)


@pytest.mark.parametrize("encoding", _TS_ENCODINGS)
def test_events_ts_normalizes_to_timestamp(spark, tmp_path, encoding):
    from restaurant_etl_spark.sources.tables import load_table

    sf_dir = tmp_path / encoding
    sf_dir.mkdir()
    _write_events_fixture(str(sf_dir / "events.parquet"), encoding)

    df = load_table(spark, str(sf_dir), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{encoding}: events.ts must normalize to TIMESTAMP, got {dict(df.dtypes)['ts']}"
    )
    # values must agree across encodings (UTC session pinned in load_table)
    got = sorted((r["event_id"], r["ts"].isoformat()) for r in df.collect())
    assert got == [
        (1, "2024-01-01T12:00:00"),
        (2, "2024-01-01T12:05:00"),
        (3, "2024-01-01T12:09:00"),
    ]
    # unix_micros — the exact call that broke 4 queries in round 3
    micros = df.select(F.unix_micros("ts").alias("us")).agg(F.min("us")).collect()[0][0]
    assert micros == 1704110400000000


@pytest.mark.parametrize("encoding", _TS_ENCODINGS)
def test_events_stream_source_watermark_analyzes(spark, tmp_path, encoding):
    """withWatermark on the staged stream source must analyze for every
    physical encoding (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE guard)."""
    from restaurant_etl_spark.streaming.jobs import events_file_stream, stage_events_source

    sf_dir = tmp_path / encoding
    sf_dir.mkdir()
    _write_events_fixture(str(sf_dir / "events.parquet"), encoding)

    staged = stage_events_source(spark, str(sf_dir), out_dir=str(tmp_path / f"{encoding}_staged"))
    stream = events_file_stream(spark, staged)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # DataFrame ops are eagerly analyzed: this line IS the assertion that
    # the watermark attaches (it raised on TIMESTAMP_NTZ in round 3)
    stream.withWatermark("ts", "10 minutes")


# ---------------------------------------------------------------------------
# Star-schema contract: the loader must surface every driver table with the
# columns and Spark-side types the 153 registered queries assume. If the
# driver regenerates testdata with a changed schema (the round-3 failure
# mode, events-only back then), this fails with a direct message instead of
# scattering AnalysisExceptions across the registry.
# ---------------------------------------------------------------------------

EXPECTED_TABLE_SCHEMAS = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "int"),
        ("c_acctbal", "double"), ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"), ("s_name", "string"), ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"),
        ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"), ("o_orderstatus", "string"),
        ("o_totalprice", "double"), ("o_orderdate", None), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
        ("l_linenumber", "int"), ("l_quantity", "double"), ("l_extendedprice", "double"),
        ("l_discount", "double"), ("l_tax", "double"), ("l_returnflag", "string"),
        ("l_linestatus", "string"), ("l_shipdate", None),
    ],
    "events": [
        ("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ],
    "embeddings": [("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int")],
}

#: date-like columns may arrive as date / timestamp / timestamp_ntz across
#: driver regenerations — every query casts before timestamp arithmetic, so
#: the contract accepts the family (None above) but pins events.ts exactly
#: (the loader normalizes it; streaming requires TIMESTAMP).
_DATE_FAMILY = {"date", "timestamp", "timestamp_ntz"}


def test_star_schema_contract(spark, sf_dir):
    from restaurant_etl_spark.sources.tables import load_table

    for table, expected in EXPECTED_TABLE_SCHEMAS.items():
        got = load_table(spark, sf_dir, table).dtypes
        assert len(got) == len(expected), f"{table}: columns changed: {got}"
        for (name, typ), (e_name, e_typ) in zip(got, expected):
            assert name == e_name, f"{table}: expected column {e_name}, got {name}"
            if e_typ is None:
                assert typ in _DATE_FAMILY, f"{table}.{name}: {typ} not a date/timestamp"
            else:
                assert typ == e_typ, f"{table}.{name}: expected {e_typ}, got {typ}"
