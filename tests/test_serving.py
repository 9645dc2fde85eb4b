"""Serving layer (§3.2/§3.3): predict dispatch for all five model
types, health states, and the documented allergen query API."""

from __future__ import annotations

import pytest

from bigdata_kafka_2_spark import etl, serving
from bigdata_kafka_2_spark.ml import knn, pipelines as P

# reuse the food fixture from the ML tests
from tests.test_ml_etl import food_csv_dir  # noqa: F401

FEATURES_BY_MODEL = {
    1: etl.CLUSTER_FEATURES,
    2: etl.CLUSTER_FEATURES,
    3: etl.CLUSTER_FEATURES,
    4: etl.REGRESSION_FEATURES,
    5: etl.CLASSIFICATION_FEATURES,
}


@pytest.fixture(scope="module")
def server(spark, food_csv_dir, tmp_path_factory):  # noqa: F811
    models_dir = str(tmp_path_factory.mktemp("serving_models"))
    saved = etl.train_all_models(spark, food_csv_dir, models_dir)
    assert len(saved) == 5
    df = etl.ingest_batches(spark, food_csv_dir)
    table = knn.knn_serving_table(P.load_model(saved["model_3_reco"]), df)
    return serving.ModelServer(spark, models_dir, FEATURES_BY_MODEL, table)


def test_predict_clustering(server):
    out = server.predict(1, {"Protein-G": 20.0, "Energy-KCAL": 300.0})
    assert out["model_type"] == "clustering"
    assert out["cluster"] in range(P.KMEANS_K)


def test_predict_regression(server):
    out = server.predict(4, {"Protein-G": 30.0, "Total lipid (fat)-G": 10.0,
                             "Carbohydrate, by difference-G": 20.0})
    assert out["model_type"] == "regression"
    assert isinstance(out["prediction"], float)


def test_predict_classification(server):
    out = server.predict(5, {"Total lipid (fat)-G": 5.0})
    assert out["model_type"] == "classification"
    assert out["predicted_label"] in (0, 1)
    assert 0.0 <= out["probability_high"] <= 1.0


def test_predict_recommendation(server):
    out = server.predict(3, {"Protein-G": 25.0, "Energy-KCAL": 400.0})
    recs = out["recommendations"]
    assert len(recs) == 5
    dists = [r["distance"] for r in recs]
    assert dists == sorted(dists)  # ascending cosine distance


def test_predict_missing_features_default_zero(server):
    # api.py:164 semantics: absent features read as 0.0
    out = server.predict(1, {})
    assert out["cluster"] in range(P.KMEANS_K)


def test_predict_unknown_model(server):
    with pytest.raises(ValueError):
        server.predict(9, {})


def test_health_states(server, spark, tmp_path):
    h = server.health()
    assert h["status"] == "healthy" and h["operational_models"] == 5

    broken = serving.ModelServer(
        spark, str(tmp_path / "empty"), FEATURES_BY_MODEL, None
    )
    hb = broken.health()
    assert hb["status"] == "unhealthy" and hb["operational_models"] == 0


def test_allergen_query_api(spark):
    table = spark.createDataFrame(
        [
            (1, "Milk Chocolate", "sugar, MILK solids, cocoa"),
            (2, "Dark Chocolate", "cocoa, sugar"),
            (3, "Peanut Bar", "peanuts, sugar, milk powder"),
        ],
        ["fdc_id", "description", "ingredients"],
    )
    hits = serving.find_allergen(table, "Milk").collect()
    assert sorted(r.fdc_id for r in hits) == [1, 3]  # case-insensitive
    row = serving.food_details(table, 2).collect()
    assert len(row) == 1 and row[0].description == "Dark Chocolate"
    assert serving.stats(table) == {"record_count": 3}
