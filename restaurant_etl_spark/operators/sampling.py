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
