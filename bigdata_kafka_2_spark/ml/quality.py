"""Distilled document-quality classifier — the fastText-style quality
model every LLM data pipeline eventually trains: start from cheap
rule-based labels (:func:`operators.text.quality_filter_flags`),
train a seeded model over content statistics, and serve the MODEL's
probability as the quality score (rules bootstrap the label; the
classifier generalizes them and produces a rankable score the binary
rules can't). Reuses the reference-derived M6 machinery
(``ml/pipelines.train_gbt_classifier`` — assemble → GBTClassifier,
seeded) so persistence/serving are uniform with the other models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml import PipelineModel
from pyspark.ml.functions import vector_to_array

from bigdata_kafka_2_spark.ml.pipelines import train_gbt_classifier
from bigdata_kafka_2_spark.operators.text import (
    char_entropy_udf,
    quality_filter_flags,
    with_text_stats,
)

#: Content statistics the classifier sees. Deliberately NOT the exact
#: quantities the rules threshold (no token count / chars-per-token /
#: TTR): the model must generalize the keep decision from correlated
#: signals, which is what makes its probability a graded score rather
#: than a re-implementation of the thresholds.
FEATURE_COLS = (
    "stat_chars",
    "stat_alpha_ratio",
    "stat_space_ratio",
    "char_entropy",
)


def _featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    ent = char_entropy_udf()
    return with_text_stats(df, text_col).withColumn(
        "char_entropy", ent(F.col(text_col))
    )


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1,
) -> PipelineModel:
    """Fit the distilled quality model: rule labels from
    :func:`quality_filter_flags` joined onto content statistics, then
    the seeded M6 GBT pipeline. One pass for stats, one for labels —
    both scan-speed; the fit is MLlib's distributed GBT."""
    labels = quality_filter_flags(df, text_col, id_col).select(
        id_col, F.col("keep")
    )
    feats = _featurize(df, text_col).join(labels, on=id_col)
    return train_gbt_classifier(
        feats,
        list(FEATURE_COLS),
        label_condition=F.col("keep"),
        seed=seed,
    )


def score_quality(
    model: PipelineModel, df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Score documents with the distilled model: adds
    ``quality_score`` = P(keep) in [0, 1] — rank, threshold, or feed
    :func:`operators.sampling.weighted_sample` with it (quality-
    weighted corpus subsampling). Row-local featurize + model
    transform; no shuffle."""
    scored = model.transform(_featurize(df, text_col))
    return scored.withColumn(
        "quality_score",
        F.round(vector_to_array("probability")[1], 6),
    ).drop("features", "rawPrediction", "probability", "prediction")
