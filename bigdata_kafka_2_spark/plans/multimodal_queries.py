"""Multimodal pipeline queries.

The driver schema has no binary media tables, so assets are derived
deterministically from ``documents`` (payload = UTF-8 bytes of the
text): the Spark-side plumbing under test — binary columns, typed
metadata, Arrow-batched ``mapInPandas`` decode — is identical to a
real media pipeline; only the decode body is a stub
(``operators/multimodal.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import multimodal as MM
from bigdata_kafka_2_spark.plans import register


def documents_as_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


@register(
    "q70_multimodal_byte_stats",
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    description="Binary-payload byte accounting through the multimodal "
    "asset schema (payload = utf-8 bytes of documents.text); "
    "metadata-only projections never scan the payload bytes "
    "(column pruning, verified in tests).",
    tags=("multimodal",),
)
def q70_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = documents_as_assets(spark, sf_dir)
    return assets.select(
        "asset_id", F.length("payload").cast("long").alias("n_bytes")
    )


@register(
    "q71_multimodal_features",
    # The stub decode IS SQL-expressible: sha256 of the utf-8 payload,
    # hex pairs → uint16 → /65536. DuckDB's sha256(varchar) hashes the
    # string's utf-8 bytes (= the payload), and each feature value
    # k/65536 with k < 2^16 is exact in both float32 and float64, so
    # the comparison needs NO rounding — the doubles are bit-identical
    # (parity incl. non-ASCII verified in tests/test_extensions.py).
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(coalesce(text, ''))) AS n_bytes,
           CAST('0x' || substr(sha256(coalesce(text, '')), 1, 4) AS BIGINT)
             / 65536.0 AS f0,
           CAST('0x' || substr(sha256(coalesce(text, '')), 5, 4) AS BIGINT)
             / 65536.0 AS f1
    FROM documents
    """,
    description="Arrow-batched mapInPandas feature extraction over "
    "binary payloads (deterministic stub decode standing in "
    "for pillow/ffmpeg; real decoder swaps into the UDF body, "
    "operator shape unchanged). The sha256 stub transcribes to "
    "SQL, so the whole mapInPandas pipeline is hash-checked.",
    tags=("multimodal",),
)
def q71_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = documents_as_assets(spark, sf_dir)
    feats = MM.extract_features(assets)
    # f0/f1 are k/65536 (k < 2^16): exact in float32, so the cast to
    # double is value-preserving and matches the oracle bit-for-bit.
    return feats.select(
        "asset_id",
        "n_bytes",
        F.element_at("feature", 1).cast("double").alias("f0"),
        F.element_at("feature", 2).cast("double").alias("f1"),
    )
