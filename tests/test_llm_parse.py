"""Tests for the pluggable LLM parser (U1-U3): transport injection, retry/
backoff, drop-on-exhaustion, JSON-schema validation, confidence metric."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.llm_parse import (
    BACKOFF_S,
    _call_with_retries,
    build_prompt,
    chunked_documents,
    extraction_confidence,
    parse_with_llm,
)

ITEM = {
    "item_name": "Samosa", "category": "Snacks", "description": None,
    "price": 5.0, "half_plate_price": None, "full_plate_price": None,
    "small_price": None, "medium_price": None, "large_price": None,
    "currency": "$", "spice_level": None, "dietary_tags": ["Vegetarian"],
}


def test_parse_with_fake_transport(spark):
    payload = json.dumps({"items": [ITEM]})
    docs = spark.createDataFrame([(1, "Samosa $5.00"), (2, "Tea $2.00")], "doc_id long, text string")
    # transport defined as a closure so it pickles by value to executors
    out = parse_with_llm(docs, transport=lambda prompt: payload).collect()
    assert len(out) == 2  # one chunk per doc, one item per chunk
    r = out[0]
    assert r["item_name"] == "Samosa" and r["price"] == 5.0 and r["dietary_tags"] == ["Vegetarian"]


def test_retry_backoff_then_success():
    calls, naps = [], []

    def flaky(prompt):
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("boom")
        return "ok"

    assert _call_with_retries(flaky, "p", sleep=naps.append) == "ok"
    assert len(calls) == 3
    assert naps == list(BACKOFF_S[:2])  # 1s then 2s (llm_parser.py:116-127)


def test_exhausted_retries_skip_chunk(spark):
    def dead(prompt):
        raise ConnectionError("down")

    docs = spark.createDataFrame([(1, "Samosa $5.00")], "doc_id long, text string")
    out = parse_with_llm(docs, transport=dead, sleep=lambda s: None)
    assert out.count() == 0  # chunk silently skipped, no exception


def test_malformed_json_filtered(spark):
    def garbled(prompt):
        return "NOT JSON {{{"

    docs = spark.createDataFrame([(1, "Samosa $5.00")], "doc_id long, text string")
    assert parse_with_llm(docs, transport=garbled).count() == 0


def test_chunking_of_long_docs(spark):
    docs = spark.createDataFrame([(1, "x" * 4100)], "doc_id long, text string")
    chunks = chunked_documents(docs).collect()
    assert [r["chunk_idx"] for r in chunks] == [0, 1, 2]
    # one transport call per chunk: a transport returning exactly one item
    # per call must yield one row per chunk
    payload = json.dumps({"items": [ITEM]})
    assert parse_with_llm(docs, transport=lambda p: payload).count() == 3


def test_prompt_carries_rules_and_chunk():
    p = build_prompt("Samosa $5", restaurant="Great India")
    assert "small/medium/large" in p and "Samosa $5" in p and "Great India" in p


def test_extraction_confidence_ratio(spark):
    all_items = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d")], "doc_id long, item string"
    )
    valid = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id long, item string")
    got = {r["doc_id"]: r for r in extraction_confidence(all_items, valid).collect()}
    assert got[1]["confidence"] == 0.6667  # 2/3
    assert got[2]["confidence"] == 0.0 and got[2]["n_valid"] == 0
