"""Model-serving layer (SURVEY.md §3.2, §3.3 — api.py re-expressed).

The reference serves five models over Flask (``api.py:172-238``) plus a
documented Parquet query API (``README.md:116-132``). The engine keeps
serving framework-free: this module is the pure logic an HTTP layer
would wrap — uniform model loading, single-row inference, the allergen
query endpoints, and health introspection.

Differences from the reference, by design (SURVEY §7.8):

- all five model types load via one ``PipelineModel.load`` (vs
  ``api.py:73-157``'s per-type paths);
- KNN answers run in Spark against the distributed serving table (vs
  collect + sklearn, ``api.py:104-122``);
- whole-stage codegen stays ON — no per-request toggle (``api.py:58``).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_kafka_2_spark.ml import knn as KNN
from bigdata_kafka_2_spark.ml import pipelines as P

#: Reference model-id → type map (api.py:19-22).
MODEL_TYPES = {
    1: "clustering",
    2: "clustering",
    3: "recommendation",
    4: "regression",
    5: "classification",
}

_MODEL_DIRS = {
    1: "model_1_kmeans",
    2: "model_2_kmeans",
    3: "model_3_reco",
    4: "model_4_gbt_reg",
    5: "model_5_gbt_clf",
}


def coerce_features(
    payload: dict[str, Any], feature_cols: list[str]
) -> dict[str, float]:
    """The §1.2 coercion policy at the API edge (``api.py:159-170``):
    every expected feature read with default 0.0 (``api.py:164``);
    unparseable values also degrade to 0.0 (the reference would 500 on
    a non-numeric payload value). This is also the ``input_processed``
    echo the reference returns in every predict response."""

    def _coerce(v) -> float:
        try:
            return float(v)
        except (TypeError, ValueError):
            return 0.0

    return {c: _coerce(payload.get(c, 0.0)) for c in feature_cols}


def create_input_df(
    spark: SparkSession, payload: dict[str, Any], feature_cols: list[str]
) -> DataFrame:
    """Single-row inference DataFrame from a JSON-ish payload (S10,
    ``api.py:159-170``), all-double schema via :func:`coerce_features`."""
    values = list(coerce_features(payload, feature_cols).values())
    schema = T.StructType(
        [T.StructField(c, T.DoubleType(), True) for c in feature_cols]
    )
    return spark.createDataFrame([values], schema=schema)


class ModelServer:
    """Loaded-model registry + prediction dispatch (``api.py`` lifecycle:
    load once at startup, serve many)."""

    def __init__(
        self,
        spark: SparkSession,
        models_dir: str,
        feature_cols_by_model: dict[int, list[str]],
        serving_table: DataFrame | None = None,
    ):
        self.spark = spark
        self.feature_cols = feature_cols_by_model
        self.models: dict[int, Any] = {}
        self.errors: dict[int, str] = {}
        for mid, sub in _MODEL_DIRS.items():
            path = os.path.join(models_dir, sub)
            try:
                self.models[mid] = P.load_model(path)
            except Exception as e:  # partial-state tolerance, api.py:143-151
                self.errors[mid] = str(e)[:200]
        # model 3 serving table: distributed, NOT collected (vs api.py:110)
        self.serving_table = serving_table
        if serving_table is not None:
            self.serving_table = serving_table.cache()

    # --- §3.2 predict dispatch (api.py:190-231) -------------------------

    def predict(self, model_id: int, payload: dict[str, Any]) -> dict[str, Any]:
        if model_id not in MODEL_TYPES:
            raise ValueError(f"unknown model_id {model_id} (valid: 1-5)")
        if model_id not in self.models:
            raise RuntimeError(
                f"model {model_id} not operational: "
                f"{self.errors.get(model_id, 'not loaded')}"
            )
        mtype = MODEL_TYPES[model_id]
        model = self.models[model_id]
        if mtype == "recommendation":
            return self._recommend(model, payload)
        df = create_input_df(self.spark, payload, self.feature_cols[model_id])
        out = model.transform(df)
        if mtype == "clustering":
            return {"model_type": mtype, "cluster": int(out.first()["prediction"])}
        if mtype == "regression":
            return {
                "model_type": mtype,
                "prediction": round(float(out.first()["prediction"]), 2),
            }
        from pyspark.ml.functions import vector_to_array

        row = out.select(
            "prediction",
            F.element_at(vector_to_array(F.col("probability")), 2).alias("p1"),
        ).first()
        return {
            "model_type": mtype,
            "predicted_label": int(row["prediction"]),
            "probability_high": round(float(row["p1"]), 4),
        }

    def _recommend(self, model, payload: dict[str, Any], k: int = 5) -> dict[str, Any]:
        """Model-3 KNN (api.py:201-212): assemble+scale the probe with
        the trained pipeline, then Spark-native cosine top-k."""
        if self.serving_table is None:
            raise RuntimeError("recommendation serving table not configured")
        from pyspark.ml.functions import vector_to_array

        df = create_input_df(self.spark, payload, self.feature_cols[3])
        probe = (
            model.transform(df)
            .select(vector_to_array("scaled_features").alias("v"))
            .first()["v"]
        )
        neighbors = KNN.knn_lookup(self.serving_table, probe, k=k).collect()
        return {
            "model_type": "recommendation",
            "recommendations": [
                {"description": r.description, "distance": r.distance}
                for r in neighbors
            ],
        }

    # --- §3.3 health (api.py:240-269) -----------------------------------

    def health(self) -> dict[str, Any]:
        per_model = {
            mid: {
                "operational": mid in self.models
                and (mid != 3 or self.serving_table is not None),
                "type": MODEL_TYPES[mid],
            }
            for mid in MODEL_TYPES
        }
        n_ok = sum(1 for v in per_model.values() if v["operational"])
        status = (
            "healthy" if n_ok == len(per_model)
            else "degraded" if n_ok > 0
            else "unhealthy"
        )
        return {"status": status, "operational_models": n_ok, "models": per_model}


# --- Documented allergen query API (README.md:116-132) -------------------

def find_allergen(table: DataFrame, term: str) -> DataFrame:
    """``GET /find_allergen?allergy=term`` — lowercase substring match
    on ``ingredients`` (``README.md:116-120``, data lowercased per
    ``README.md:92``)."""
    from bigdata_kafka_2_spark.operators.relational import substring_filter

    return substring_filter(table, "ingredients", term)


def food_details(table: DataFrame, fdc_id: int) -> DataFrame:
    """``GET /food_details/<fdc_id>`` — point lookup (``README.md:122-126``)."""
    from bigdata_kafka_2_spark.operators.relational import point_lookup

    return point_lookup(table, "fdc_id", fdc_id)


def stats(table: DataFrame) -> dict[str, int]:
    """``GET /stats`` — record count (``README.md:128-132``)."""
    return {"record_count": table.count()}
