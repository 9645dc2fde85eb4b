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


@register(
    "q113_media_probe_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(doc_id % 16 + 1 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(n_chars % 16 + 1 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1 THEN CAST(8000 AS INT) END
             AS sample_rate,
           CASE WHEN doc_id % 2 = 1 THEN CAST(1 AS INT) END AS n_channels,
           CASE WHEN doc_id % 2 = 1
                THEN CAST((n_chars % 50 + 1) * 10 AS BIGINT) END
             AS duration_ms,
           CASE WHEN doc_id % 2 = 0
                THEN round(CAST(n_chars % 256 AS DOUBLE), 4) END
             AS mean_luma,
           CASE WHEN doc_id % 2 = 1 THEN 0.5 END AS rms
    FROM documents
    """,
    description="REAL media decode round-trip "
    "(operators/multimodal.synthesize_assets -> probe_media): even "
    "doc_ids become genuine solid-gray 24-bit BMP files, odd ones "
    "genuine 16-bit PCM WAV square waves (struct.pack writers), and "
    "the INDEPENDENT stdlib parser recovers dimensions, pixel mean "
    "luma, sample rate, duration, and RMS — hash-checked against the "
    "closed-form expectations derived from the driving columns "
    "(solid gray g has luma exactly g; a +-a square wave has RMS "
    "exactly a/32768). No pillow/ffmpeg, no stub: the decode path "
    "exercised here parses actual file bytes; only codec-library "
    "formats (JPEG pixels, non-PCM audio, video) remain stubbed.",
    tags=("multimodal", "udf"),
)
def q113_media_probe_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    params = d.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("modality"),
        (F.col("doc_id") % 16 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 16 + 1).cast("int").alias("height"),
        (F.col("n_chars") % 256).cast("int").alias("luma"),
        F.lit(8000).alias("sample_rate"),
        ((F.col("n_chars") % 50 + 1) * 80).cast("int").alias("n_samples"),
        F.lit(16384).alias("amplitude"),
    )
    assets = MM.synthesize_assets(params)
    return MM.probe_media(assets).drop("modality")
