"""Multimodal pipeline under the driver's correctness gate (SURVEY.md §2B).

The media table is synthesized from ``documents`` (content = utf-8 bytes of
the text, kind cycling image/audio/video, typed metadata from text length)
so the full binary-column pipeline — opaque ``binary`` payload + typed
metadata struct → Arrow-batched ``mapInPandas`` feature extraction
(sources/multimodal.py) — runs end-to-end with a DuckDB-checkable result.

The oracle checks what SQL can state in closed form: exact byte counts and
kinds per media row, plus a unit-norm flag proving the feature vector came
out of the (stubbed, deterministic) decoder normalized. The decode itself
is environment-stubbed (no codecs in this container) — swap _decode_stub
for PIL/libav on a real cluster; this query's plumbing is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.multimodal import extract_features
from restaurant_etl_spark.sources.tables import load_table


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents → media table: binary payload + typed metadata. The 100 TB
    layout: content stays opaque bytes, metadata columns are scalars that
    drive partition pruning; no decode happens at scan time."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    n = F.length("text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(length(text) AS INTEGER) AS n_bytes,
           TRUE AS unit_norm
    FROM documents
    WHERE doc_id % 7 = 0 AND length(text) > 0
    """,
    category="multimodal",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media → fixed-dim feature vectors via Arrow mapInPandas, then
    a scalar projection the driver can hash: byte counts are exact (ASCII
    text ⇒ chars == bytes, asserted by the oracle's length()), and the
    unit_norm flag proves each 16-dim histogram came out L2-normalized."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 7 == 0) & (F.length("text") > 0)
    )
    media = media_from_documents(docs)
    feats = extract_features(media)
    sq_norm = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        (F.abs(F.sqrt(sq_norm) - 1.0) < 1e-3).alias("unit_norm"),
    )
