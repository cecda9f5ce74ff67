"""Deterministic dataset splitting and sampling for training pipelines:
train/val/test assignment and per-class stratified sampling as pure hash
filters — no RNG state, no sampling order dependence, identical membership
on every engine and at every re-run (the property that makes eval sets
stable across a 100 TB corpus rebuild).

Everything is a narrow map/filter: zero shuffles, trivially parallel.
``sample_bernoulli_seeded`` (relational.py) covers the rate-only case;
these add the split and per-class forms a data pipeline actually ships.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

#: percent buckets: [0,90) train, [90,95) val, [95,100) test
VAL_PCT = 90
TEST_PCT = 95


def _pct_bucket(key: Column) -> Column:
    """Stable 0-99 bucket from the md5 of a key — replayable in DuckDB."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint") % 100


@register(
    "split_train_val_test",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS pct
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN pct < {VAL_PCT} THEN 'train'
                WHEN pct < {TEST_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    category="sampling",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment by hashed doc_id: membership is a
    pure function of the key, so adding documents never reshuffles existing
    assignments and every engine/run agrees row-for-row. One narrow
    projection — the split of a 100 TB corpus costs one scan."""
    d = load_table(spark, sf_dir, "documents")
    pct = _pct_bucket(F.col("doc_id"))
    return d.select(
        "doc_id",
        F.when(pct < VAL_PCT, "train")
        .when(pct < TEST_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "sample_stratified_by_label",
    oracle="""
    WITH s AS (
        SELECT vec_id, label,
               ('0x' || substr(md5('strat|' || vec_id::VARCHAR), 1, 8))::BIGINT % 100 AS pct
        FROM embeddings
    )
    SELECT label,
           count(*) AS n_sampled,
           min(vec_id) AS min_vec_id,
           max(vec_id) AS max_vec_id
    FROM s
    WHERE pct < 20
    GROUP BY label
    """,
    category="sampling",
)
def sample_stratified_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample per class via a salted hash filter (salt keeps
    it independent of the train/test split), summarized per label. The
    filter is map-side; only the tiny per-class summary shuffles. For a
    fixed-COUNT-per-class sample use a window rank over the same hash —
    this rate form avoids the shuffle entirely."""
    e = load_table(spark, sf_dir, "embeddings")
    pct = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("strat|"), F.col("vec_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        e.filter(pct < 20)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
    )


#: data-mixing rates per language (the pretraining "mixture weights"
#: knob): up-weight the low-resource tail, keep half of the en head.
#: Values are per-mille kept (out of 1000) so the hash gate is integral.
MIXTURE_PERMILLE = {"en": 500, "fr": 800, "es": 800, "de": 1000, "zh": 1000}


@register(
    "sample_weighted_mixture",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS pm,
               CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in MIXTURE_PERMILLE.items())}
                    ELSE 0 END AS keep_pm
        FROM documents
    )
    SELECT doc_id, lang FROM b WHERE pm < keep_pm
    """,
    category="sampling",
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: per-source (here per-language) sampling rates applied
    in ONE scan via a salted hash gate — the step that turns a raw crawl
    into a weighted pretraining mixture (e.g. keep 50% of the English
    head, all of the low-resource tail). Membership is a pure function of
    (salt, doc_id), so the mixture is reproducible, rebuild-stable, and
    composes with split_train_val_test (independent salts → independent
    gates). Zero shuffles at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    pm = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % 1000
    )
    keep = F.lit(0)
    for k, v in MIXTURE_PERMILLE.items():
        keep = F.when(F.col("lang") == k, v).otherwise(keep)
    return d.select("doc_id", "lang").filter(pm < keep)


@register(
    "corpus_mixture_report",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tok,
               ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS pm,
               CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in MIXTURE_PERMILLE.items())}
                    ELSE 0 END AS keep_pm
        FROM documents
    ),
    agg AS (
        SELECT lang, keep_pm AS target_permille,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN pm < keep_pm THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
               CAST(sum(CASE WHEN pm < keep_pm THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
        FROM t GROUP BY lang, keep_pm
    )
    SELECT lang, target_permille, n_docs, n_tokens, kept_docs, kept_tokens,
           round(kept_tokens * 1.0 / (SELECT sum(kept_tokens) FROM agg), 4)
               AS kept_token_share
    FROM agg
    """,
    category="sampling",
)
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture ACCOUNTING artifact that pairs with
    sample_weighted_mixture: per language — raw doc/token counts, the
    target keep rate, what the hash gate actually kept, and each
    language's share of the post-mixture token budget. This is the table
    a pretraining run reviews before launching (did the weights produce
    the intended token mixture?) and re-emits after every corpus
    refresh; because the gate is a pure function of (salt, doc_id), the
    report is exactly reproducible against any rebuild.

    Scale shape: one scan computing per-doc token counts + the gate
    (pure map), one bounded groupBy(lang), and a 1-row total broadcast
    for the share — no join against the sampled output, the gate is
    re-evaluated inline."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    pm = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % 1000
    )
    keep = F.lit(0)
    for k, v in MIXTURE_PERMILLE.items():
        keep = F.when(F.col("lang") == k, v).otherwise(keep)
    t = d.select(
        "lang",
        n_tok.alias("n_tok"),
        pm.alias("pm"),
        keep.alias("keep_pm"),
    )
    agg = t.groupBy("lang", F.col("keep_pm").alias("target_permille")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum(F.when(F.col("pm") < F.col("keep_pm"), 1).otherwise(0)).alias("kept_docs"),
        F.sum(F.when(F.col("pm") < F.col("keep_pm"), F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
    )
    total = agg.agg(F.sum("kept_tokens").alias("total_kept"))
    return agg.crossJoin(F.broadcast(total)).select(
        "lang",
        "target_permille",
        "n_docs",
        "n_tokens",
        "kept_docs",
        "kept_tokens",
        F.round(F.col("kept_tokens") / F.col("total_kept"), 4).alias("kept_token_share"),
    )
