"""Similarity-search queries over ``embeddings`` (charter extension;
Spark-native KNN per SURVEY.md §2.8 — cosine, exact top-k, ascending
distance, reproducing api.py:119 semantics without the driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import similarity as SIM
from bigdata_kafka_2_spark.plans import register


@register(
    "q50_cosine_topk",
    oracle="""
    SELECT e.vec_id,
           round(CAST(list_cosine_similarity(e.embedding, p.embedding) AS DOUBLE), 4)
             AS similarity
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) p
    WHERE e.vec_id <> 0
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT 5
    """,
    description="Exact cosine top-5 neighbors of probe vec_id=0 "
    "(broadcast probe + codegen'd zip_with/aggregate dot "
    "product + TakeOrderedAndProject; table never shuffles). "
    "Spark-native KNN of SURVEY §2.8 (k=5 cosine, api.py:119).",
    tags=("similarity", "flagship"),
)
def q50_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0)
    return SIM.cosine_topk(e, probe, k=5)


@register(
    "q51_cosine_topk_many",
    oracle="""
    SELECT p.vec_id AS probe_id, e.vec_id,
           round(CAST(list_cosine_similarity(e.embedding, p.embedding) AS DOUBLE), 4)
             AS similarity,
           rank
    FROM (
      SELECT p.vec_id AS p_id, e.vec_id AS e_id,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(CAST(list_cosine_similarity(e.embedding, p.embedding) AS DOUBLE), 4) DESC,
                        e.vec_id ASC
             ) AS rank
      FROM embeddings e, embeddings p
      WHERE p.vec_id < 5 AND e.vec_id <> p.vec_id
    ) r
    JOIN embeddings e ON e.vec_id = r.e_id
    JOIN embeddings p ON p.vec_id = r.p_id
    WHERE rank <= 3
    """,
    description="Batch KNN: exact cosine top-3 per probe (probes = "
    "vec_id < 5) via broadcast nest-loop + per-probe window "
    "top-k — the many-probe serving shape.",
    tags=("similarity", "window"),
)
def q51_cosine_topk_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    out = SIM.cosine_topk_many(e, probes, k=3)
    # bigint rank: row_number is int32 in Spark, int64 in DuckDB
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "q52_embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4)
             AS similarity
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) >= 0.8
    """,
    description="Embedding near-duplicate pairs (cosine ≥ 0.8), exact "
    "all-pairs baseline; LSH-bucketed variant is the scale "
    "path (q53).",
    tags=("similarity", "dedup"),
)
def q52_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs(e, threshold=0.8)


@register(
    "q53_lsh_bucketed_near_dup",
    oracle=None,  # hyperplane constants not SQL-portable
    description="Cosine-LSH bucketed near-dup: random-hyperplane sign "
    "buckets (8 planes, seed 42) + in-bucket exact verify "
    "(cosine ≥ 0.8). Candidate generation is an equi-join on "
    "the bucket — the no-cross-join 100 TB path. Recall vs "
    "q52 validated in tests.",
    tags=("similarity", "dedup"),
)
def q53_lsh_bucketed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    b = SIM.random_hyperplane_buckets(e, n_planes=8, dim=64, seed=42)
    a = b.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
        "lsh_bucket",
    )
    c = b.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
        "lsh_bucket",
    )
    from bigdata_kafka_2_spark.functions import cosine_similarity

    return (
        a.join(c, on="lsh_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("vec_a", "vec_b"), 4).alias("similarity"),
        )
        .filter(F.col("similarity") >= 0.8)
        .distinct()
    )
