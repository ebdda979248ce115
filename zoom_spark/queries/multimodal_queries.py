"""Multimodal-column gated queries (X5): binary payload plumbing over
the documents table (text bytes standing in for image/audio blobs —
the decode stage is stubbed, the Spark plumbing is real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zoom_spark.io import load_table
from zoom_spark.multimodal.binary_ops import extract_features, to_media_table
from zoom_spark.queries import register


@register(
    "multimodal_metadata",
    sql="""
    SELECT doc_id AS media_id,
           'text' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(sha256(text)) AS sha256_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media-table metadata (byte length + content sha256),
    computed JVM-side with the blob column pruned from the output —
    the metadata-only pass an X1 content-hash dedup runs at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    media = to_media_table(docs, id_col="doc_id", payload_col="text", media_type="text")
    return media.select("media_id", "media_type", "byte_len", "sha256_hex")


@register("multimodal_features")  # mapInPandas stub decoder: rows-only
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction through the
    stubbed decoder — exercises the real batch shape/schema/partition
    plumbing; rounds features for stable rows-only counting."""
    docs = load_table(spark, sf_dir, "documents")
    media = to_media_table(docs, id_col="doc_id", payload_col="text", media_type="text")
    feats = extract_features(media, n_features=8)
    return feats.select(
        "media_id",
        "media_type",
        "byte_len",
        F.transform("feature", lambda x: F.round(x, 6)).alias("feature"),
    )
