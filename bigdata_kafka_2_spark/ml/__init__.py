"""ML pipelines (SURVEY.md §2.7, M1-M7) — the reference's five model
types re-expressed as uniform ``pyspark.ml`` Pipelines."""

from bigdata_kafka_2_spark.ml.pipelines import (
    train_gbt_classifier,
    train_gbt_regressor,
    train_kmeans,
    train_scaled_features,
)

__all__ = [
    "train_gbt_classifier",
    "train_gbt_regressor",
    "train_kmeans",
    "train_scaled_features",
]
