"""ML pipelines (SURVEY.md §2.7).

Reference parity, with the reference's exact hyperparameters:

- M1 VectorAssembler: ``handleInvalid="skip"`` at train / ``"keep"`` at
  inference (``spark_model_trainer.py:76,99,125,162``; ``api.py:193,204``).
- M2 StandardScaler: ``withStd=True, withMean=True``
  (``spark_model_trainer.py:77,100``).
- M3 KMeans: ``k=5, seed=1`` (``spark_model_trainer.py:31,78``).
- M5 GBTRegressor: ``maxIter=10`` (``spark_model_trainer.py:130``).
- M6 GBTClassifier: ``maxIter=10``, label from a threshold condition
  (``spark_model_trainer.py:41-44,151-153``; threshold 20.0 at ``:43``).
- M7 Pipeline composition: the reference saves *some* fitted stages
  individually (``spark_model_trainer.py:84-85,107``) — here every
  trainer returns one whole ``PipelineModel``, saved/loaded uniformly
  (the SURVEY §7.4 simplification), so serving needs exactly one
  ``PipelineModel.load`` per model (vs api.py:73-157's per-type paths).

All trainers gate on data sufficiency like the reference
(``spark_model_trainer.py:72,95,121,158``): below ``min_rows`` they
raise ``InsufficientDataError`` instead of fitting garbage.

The functions are schema-parametric (feature columns passed in) so the
same pipelines serve the reference's 17-nutrient food schema and the
driver's star-schema/embeddings tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier
from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference hyperparameters (spark_model_trainer.py:31,43,130,164).
KMEANS_K = 5
KMEANS_SEED = 1
GBT_MAX_ITER = 10
HIGH_PROTEIN_THRESHOLD = 20.0

#: Reference data-sufficiency gates (spark_model_trainer.py:72,95,121,158).
MIN_ROWS_CLUSTERING = 5
MIN_ROWS_REGRESSION = 10
MIN_ROWS_CLASSIFICATION = 20


class InsufficientDataError(ValueError):
    """Raised when a trainer's row gate fails (the reference skips the
    model and logs; a library raises so callers decide)."""


def _gate(df: DataFrame, min_rows: int, what: str) -> None:
    n = df.count()
    if n < min_rows:
        raise InsufficientDataError(
            f"{what}: {n} rows < required {min_rows} (reference gate, "
            "spark_model_trainer.py:72,95,121,158)"
        )


def _assembler(feature_cols: Sequence[str], handle_invalid: str) -> VectorAssembler:
    return VectorAssembler(
        inputCols=list(feature_cols),
        outputCol="features",
        handleInvalid=handle_invalid,
    )


def train_kmeans(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int = KMEANS_K,
    seed: int = KMEANS_SEED,
) -> PipelineModel:
    """M3: assemble → z-score → KMeans(k, seed) as one PipelineModel.

    ``transform`` adds ``prediction`` (cluster id) — the reference's
    clustering response (``api.py:198-199``).
    """
    _gate(df, max(MIN_ROWS_CLUSTERING, k), "kmeans")
    pipe = Pipeline(
        stages=[
            _assembler(feature_cols, "skip"),
            StandardScaler(
                inputCol="features",
                outputCol="scaled_features",
                withStd=True,
                withMean=True,
            ),
            KMeans(featuresCol="scaled_features", k=k, seed=seed),
        ]
    )
    return pipe.fit(df)


def train_scaled_features(
    df: DataFrame,
    feature_cols: Sequence[str],
) -> PipelineModel:
    """M2 + reco-prep (model 3 training half,
    ``spark_model_trainer.py:91-114``): assemble → z-score.

    ``transform`` yields ``scaled_features`` — persist alongside the
    id/description column as the KNN serving table (the engine keeps it
    as a DataFrame; see ``ml/knn.py`` for the serving join that
    replaces the reference's driver-side sklearn index).
    """
    _gate(df, 1, "scaled_features")
    pipe = Pipeline(
        stages=[
            _assembler(feature_cols, "skip"),
            StandardScaler(
                inputCol="features",
                outputCol="scaled_features",
                withStd=True,
                withMean=True,
            ),
        ]
    )
    return pipe.fit(df)


def train_gbt_regressor(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    max_iter: int = GBT_MAX_ITER,
    seed: int = KMEANS_SEED,
) -> PipelineModel:
    """M5: assemble → GBTRegressor(maxIter=10) pipeline
    (``spark_model_trainer.py:116-142``; reference features {protein,
    fat, carbs} → Energy-KCAL, ``spark_model_trainer.py:37-38``)."""
    _gate(df, MIN_ROWS_REGRESSION, "gbt_regressor")
    pipe = Pipeline(
        stages=[
            _assembler(feature_cols, "skip"),
            GBTRegressor(
                featuresCol="features",
                labelCol=label_col,
                maxIter=max_iter,
                seed=seed,
            ),
        ]
    )
    return pipe.fit(df)


def train_gbt_classifier(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_condition: Column,
    max_iter: int = GBT_MAX_ITER,
    seed: int = KMEANS_SEED,
    label_col: str = "label",
) -> PipelineModel:
    """M6: threshold-derived binary label → assemble →
    GBTClassifier(maxIter=10) (``spark_model_trainer.py:144-173``;
    reference condition ``Protein-G > 20.0``, ``:41-43``).

    The label column is materialized before the pipeline (as in the
    reference) — callers re-derive it at inference only for evaluation.
    ``transform`` adds ``prediction`` and ``probability``
    (``api.py:226-230`` reads P(class=1) from the probability vector).
    """
    labeled = df.withColumn(
        label_col, F.when(label_condition, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    _gate(labeled, MIN_ROWS_CLASSIFICATION, "gbt_classifier")
    pipe = Pipeline(
        stages=[
            _assembler(feature_cols, "skip"),
            GBTClassifier(
                featuresCol="features",
                labelCol=label_col,
                maxIter=max_iter,
                seed=seed,
            ),
        ]
    )
    return pipe.fit(labeled)


def save_model(model: PipelineModel, path: str) -> None:
    """S9: uniform overwrite-save (``spark_model_trainer.py:84-85``...)."""
    model.write().overwrite().save(path)


def load_model(path: str) -> PipelineModel:
    """S9: uniform load (``api.py:90-135`` per-type loads collapse to
    one ``PipelineModel.load``)."""
    return PipelineModel.load(path)
