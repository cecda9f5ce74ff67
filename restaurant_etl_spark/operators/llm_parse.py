"""Optional LLM-backed menu parser (SURVEY.md §2A U1-U3) — the pluggable
twin of the deterministic rule parser (operators/menu_parser.py), emitting
the same item schema so the two are drop-in interchangeable
(SURVEY §7.4: the rule parser is the oracle-checked correctness path; this
one reproduces the reference's *API* behavior).

Reference semantics reproduced:
  * fixed 2,000-char chunking before the call (llm_parser.py:169-181);
  * per-chunk structured-extraction call with a strict JSON schema
    (llm_parser.py:128-168) — the HTTP transport is INJECTABLE and this
    environment has no network, so the default transport raises; tests
    supply a fake (tests/test_llm_parse.py);
  * retry with exponential backoff 1→2→4s, 3 attempts, chunk silently
    skipped on exhaustion (llm_parser.py:116-127);
  * response validation via ``from_json`` with a fixed schema — malformed
    JSON degrades to null and is filtered, mirroring jsonschema rejection
    (llm_parser.py:165-166).

Scale shape: chunks explode to a (doc_id, chunk_idx, chunk_text) child
table; calls run inside ``mapInPandas`` with one transport per executor
(the lazy-singleton pattern, pdf_extractor.py:10-22) and bounded batch
sizes via Arrow; failed chunks yield null rows that the validity filter
drops — no exceptions cross the UDF boundary.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from restaurant_etl_spark.functions.cleaning import chunk_text, normalize_extracted_text

#: strict response schema for from_json (llm_parser.py:26-57 analog)
ITEMS_JSON_SCHEMA = (
    "struct<items: array<struct<item_name:string, category:string, "
    "description:string, price:double, half_plate_price:double, "
    "full_plate_price:double, small_price:double, medium_price:double, "
    "large_price:double, currency:string, spice_level:string, "
    "dietary_tags:array<string>>>>"
)

MAX_ATTEMPTS = 3
BACKOFF_S = (1.0, 2.0, 4.0)

Transport = Callable[[str], str]


def default_transport(prompt: str) -> str:  # pragma: no cover - no network here
    """Placeholder for the real chat-completion HTTP call. This container
    has no network access; deployments inject their own transport."""
    raise NotImplementedError(
        "No LLM transport configured; pass transport= to parse_with_llm "
        "(see tests/test_llm_parse.py for the injection pattern)."
    )


def deterministic_rule_transport(prompt: str) -> str:
    """Deterministic stand-in for the chat-completion call, used to drive
    the FULL U1-U3 pipeline (chunk explode → mapInPandas batches → retry
    wrapper → from_json schema gate → item explode) under the external
    correctness gate without a network. It applies the prompt's own
    decision rules (build_prompt: 2 prices → half/full, 3 prices →
    small/medium/large, parenthesized dietary tag) with plain string ops —
    a tiny but honest "model" whose output is closed-form SQL-predictable.

    Module-level (not a closure) so Spark can pickle it to executors."""
    import re

    text = prompt.rsplit("MENU TEXT:\n", 1)[-1]
    items = []
    for line in text.splitlines():
        line = line.strip()
        prices = [float(m) for m in re.findall(r"\$(\d+(?:\.\d+)?)", line)]
        if not prices:
            continue
        name = line.split("$", 1)[0]
        tags = ["Vegetarian"] if "(Vegetarian)" in name else None
        name = re.sub(r"\s*\((?:Half/Full|Vegetarian)\)\s*", " ", name).strip()
        item: dict = {"item_name": name, "currency": "$"}
        if tags:
            item["dietary_tags"] = tags
        if len(prices) == 1:
            item["price"] = prices[0]
        elif len(prices) == 2:
            item["half_plate_price"], item["full_plate_price"] = prices
        else:
            (
                item["small_price"],
                item["medium_price"],
                item["large_price"],
            ) = prices[:3]
        items.append(item)
    return json.dumps({"items": items})


def build_prompt(chunk: str, restaurant: str | None = None) -> str:
    """U3 — prompt assembly with the BetterVersion decision rules
    (BetterVersion/prompt_template.py:1-91), condensed."""
    head = (
        "Extract menu items as JSON {\"items\": [...]}. Rules: split "
        "slash-separated variants; map 2 prices to half/full and 3 prices "
        "to small/medium/large; 'Choice of' lines are one item; price "
        "ranges take the lower bound; ALL-CAPS lines are category headers."
    )
    if restaurant:
        head += f" Restaurant: {restaurant}."
    return f"{head}\n\nMENU TEXT:\n{chunk}"


def _call_with_retries(transport: Transport, prompt: str, sleep=time.sleep) -> str | None:
    """U2 — 3 attempts, exponential backoff, None on exhaustion (the chunk
    is then skipped silently, llm_parser.py:116-127)."""
    for attempt in range(MAX_ATTEMPTS):
        try:
            return transport(prompt)
        except Exception:  # noqa: BLE001 - every failure retries
            if attempt < MAX_ATTEMPTS - 1:
                sleep(BACKOFF_S[attempt])
    return None


def chunked_documents(docs: DataFrame, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """R1 — normalize + fixed-width chunk explode to the child table."""
    norm = normalize_extracted_text(F.col(text))
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        F.posexplode(chunk_text(norm)).alias("chunk_idx", "chunk_text"),
    ).filter(F.length("chunk_text") > 0)


def parse_with_llm(
    docs: DataFrame,
    transport: Transport = default_transport,
    restaurant: str | None = None,
    sleep=time.sleep,
) -> DataFrame:
    """U1 — chunk → per-partition batched calls → from_json validation →
    exploded item rows (same columns as the rule parser's raw items)."""

    def call_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one transport per executor process (lazy singleton already bound
        # into the closure; real deployments build clients here)
        for pdf in batches:
            raw = [
                _call_with_retries(transport, build_prompt(c, restaurant), sleep)
                for c in pdf["chunk_text"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "chunk_idx": pdf["chunk_idx"], "raw": raw}
            )

    chunks = chunked_documents(docs)
    called = chunks.mapInPandas(call_batches, "doc_id bigint, chunk_idx int, raw string")
    parsed = called.withColumn("resp", F.from_json("raw", ITEMS_JSON_SCHEMA))
    # null raw (exhausted retries) and unparseable JSON both yield null resp
    return (
        parsed.filter(F.col("resp").isNotNull() & F.col("resp.items").isNotNull())
        .select("doc_id", "chunk_idx", F.explode("resp.items").alias("it"))
        .select("doc_id", "chunk_idx", "it.*")
    )


def extraction_confidence(all_items: DataFrame, valid_items: DataFrame) -> DataFrame:
    """A5 — per-document confidence = valid / max(1, total)
    (llm_parser.py:111): two counts joined on doc_id, not an accumulator."""
    total = all_items.groupBy("doc_id").agg(F.count("*").alias("n_total"))
    valid = valid_items.groupBy("doc_id").agg(F.count("*").alias("n_valid"))
    return total.join(valid, "doc_id", "left").select(
        "doc_id",
        "n_total",
        F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
        F.round(
            F.coalesce("n_valid", F.lit(0)) / F.greatest(F.lit(1), F.col("n_total")), 4
        ).alias("confidence"),
    )
