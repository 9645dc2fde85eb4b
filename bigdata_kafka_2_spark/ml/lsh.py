"""MLlib-native approximate similarity (SURVEY.md §2.8 / M4 approx
variants): the built-in LSH estimators the survey maps the reference's
KNN escape hatch onto.

Two families:

- :func:`minhash_lsh_model` / :func:`approx_jaccard_pairs` —
  ``HashingTF``(binary) over token shingles → ``MinHashLSH`` →
  ``approxSimilarityJoin`` (Jaccard distance). The MLlib twin of the
  expression-based ``operators.dedup.minhash_lsh_pairs``.
- :func:`brp_lsh_model` / :func:`approx_euclidean_neighbors` —
  ``BucketedRandomProjectionLSH`` over embedding vectors (Euclidean);
  the MLlib ANN path for dense vectors.

Both keep everything distributed (fit is a metadata-only operation for
LSH — no training data collected).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.text import normalize_text


def _shingle_vectors(
    df: DataFrame, text_col: str, id_col: str, k: int, num_features: int
) -> DataFrame:
    # Staged token array (the shingles() rule — an inlined
    # normalize+split inside the lambda re-splits per shingle index).
    staged = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    with_sh = staged.select(
        F.col(id_col), F.array_remove(sh, "").alias("shingles")
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features,
        binary=True,
    )
    return tf.transform(with_sh).filter(F.size("shingles") > 0)


def approx_jaccard_pairs(
    df: DataFrame,
    threshold_distance: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH
    ``approxSimilarityJoin``: (id_a, id_b, jaccard_distance ≤
    threshold_distance), id_a < id_b."""
    vecs = _shingle_vectors(df, text_col, id_col, k, num_features)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=seed,
    ).fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, threshold_distance, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def approx_euclidean_neighbors(
    table: DataFrame,
    probe_vec,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate k nearest neighbors (Euclidean) via
    BucketedRandomProjectionLSH ``approxNearestNeighbors``."""
    from pyspark.ml.functions import array_to_vector

    vecs = table.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    ).fit(vecs)
    from pyspark.ml.linalg import Vectors

    key = Vectors.dense([float(x) for x in probe_vec])
    return model.approxNearestNeighbors(vecs, key, k).select(
        id_col, F.round("distCol", 4).alias("euclidean_distance")
    )
