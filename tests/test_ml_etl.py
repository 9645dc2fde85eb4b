"""ML pipelines (M1-M7) + batch ETL lifecycle (§3.1): invariant tests
(seeded, per SURVEY §5.2 — cluster counts, probability ranges, monotone
KNN distances) rather than exact-output hashes."""

from __future__ import annotations

import csv
import math
import random

import pytest
from pyspark.sql import functions as F

from bigdata_kafka_2_spark import etl
from bigdata_kafka_2_spark.io import read_table
from tests.conftest import SF_DIR
from bigdata_kafka_2_spark.ml import knn, pipelines as P
from bigdata_kafka_2_spark.schema import FOOD_NUMERIC_COLUMNS


@pytest.fixture(scope="module")
def food_csv_dir(tmp_path_factory):
    """Deterministic food-schema CSV batch directory (FIXTURES.md §1):
    3 batch files × 100 rows, some missing/malformed cells, protein
    spread across the 20.0 threshold."""
    rng = random.Random(7)
    root = tmp_path_factory.mktemp("batches")
    cols = list(FOOD_NUMERIC_COLUMNS) + ["description"]
    for b in range(3):
        with open(root / f"batch_{b}.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(cols)
            for i in range(100):
                protein = rng.uniform(0, 40)
                fat = rng.uniform(0, 30)
                carbs = rng.uniform(0, 60)
                kcal = 4 * protein + 9 * fat + 4 * carbs + rng.uniform(-20, 20)
                row = [
                    round(protein, 2),
                    round(fat, 2),
                    round(carbs, 2),
                    round(kcal, 2),
                ] + [round(rng.uniform(0, 100), 2) for _ in range(13)]
                row.append(f"food_{b}_{i}")
                if i % 17 == 0:
                    row[5] = ""  # missing numeric → 0.0
                if i % 23 == 0:
                    row[6] = "bad!"  # malformed numeric → 0.0
                w.writerow(row)
    return str(root)


def test_ingest_conform(spark, food_csv_dir):
    df = etl.ingest_batches(spark, food_csv_dir)
    assert df.count() == 300
    assert len(df.columns) == 18
    # malformed / missing numerics became 0.0, never null
    nulls = df.filter(F.col("Fiber, total dietary-G").isNull()).count()
    assert nulls == 0


def test_slice_sizes_arithmetic():
    assert etl.slice_sizes(300) == [60, 120, 180, 240, 300]
    assert etl.slice_sizes(101) == [20, 40, 60, 80, 101]
    # base_increment == 0 edge case (spark_model_trainer.py:218-224)
    assert etl.slice_sizes(3) == [3, 3, 3, 3, 3]


def test_cumulative_slices_deterministic_prefixes(spark, food_csv_dir):
    df = etl.ingest_batches(spark, food_csv_dir)
    slices = etl.cumulative_slices(df, ["description"])
    sizes = [s.count() for s in slices]
    assert sizes == [60, 120, 180, 240, 300]
    first = set(r.description for r in slices[0].select("description").collect())
    second = set(r.description for r in slices[1].select("description").collect())
    assert first < second  # true prefix under the total order
    # re-running yields the same prefix (the determinism fix for L1)
    again = set(
        r.description
        for r in etl.cumulative_slices(df, ["description"])[0]
        .select("description")
        .collect()
    )
    assert first == again


@pytest.fixture(scope="module")
def trained(spark, food_csv_dir, tmp_path_factory):
    models_dir = str(tmp_path_factory.mktemp("models"))
    saved = etl.train_all_models(spark, food_csv_dir, models_dir)
    return saved


def test_all_five_models_trained(trained):
    assert sorted(trained) == [
        "model_1_kmeans",
        "model_2_kmeans",
        "model_3_reco",
        "model_4_gbt_reg",
        "model_5_gbt_clf",
    ]


def test_kmeans_invariants(spark, food_csv_dir, trained):
    df = etl.ingest_batches(spark, food_csv_dir)
    model = P.load_model(trained["model_1_kmeans"])
    preds = model.transform(df).select("prediction").distinct().collect()
    clusters = {r.prediction for r in preds}
    assert clusters <= set(range(P.KMEANS_K)) and len(clusters) >= 2


def test_regression_invariants(spark, food_csv_dir, trained):
    df = etl.ingest_batches(spark, food_csv_dir)
    model = P.load_model(trained["model_4_gbt_reg"])
    rows = model.transform(df).select("Energy-KCAL", "prediction").collect()
    assert all(math.isfinite(r.prediction) for r in rows)
    # kcal ≈ 4p+9f+4c: the model must beat a mean-only baseline
    mean = sum(r["Energy-KCAL"] for r in rows) / len(rows)
    sse_model = sum((r.prediction - r["Energy-KCAL"]) ** 2 for r in rows)
    sse_mean = sum((mean - r["Energy-KCAL"]) ** 2 for r in rows)
    assert sse_model < sse_mean * 0.5


def test_classifier_invariants(spark, food_csv_dir, trained):
    from pyspark.ml.functions import vector_to_array

    df = etl.ingest_batches(spark, food_csv_dir)
    model = P.load_model(trained["model_5_gbt_clf"])
    out = model.transform(df).select(
        "prediction", vector_to_array("probability").alias("p")
    )
    rows = out.collect()
    assert all(r.prediction in (0.0, 1.0) for r in rows)
    assert all(
        len(r.p) == 2 and 0.0 <= r.p[1] <= 1.0 and abs(sum(r.p) - 1.0) < 1e-6
        for r in rows
    )


def test_knn_serving_exact(spark, food_csv_dir, trained):
    df = etl.ingest_batches(spark, food_csv_dir)
    model = P.load_model(trained["model_3_reco"])
    serving = knn.knn_serving_table(model, df).cache()
    probe_row = serving.filter(F.col("description") == "food_0_0").collect()[0]
    out = knn.knn_lookup(
        serving.filter(F.col("description") != "food_0_0"),
        probe_row.scaled_vec,
        k=5,
    ).collect()
    assert len(out) == 5
    dists = [r.distance for r in out]
    assert dists == sorted(dists)  # ascending (api.py:210-212 semantics)
    # exact check against a driver-side cosine computation
    import numpy as np

    all_rows = serving.filter(F.col("description") != "food_0_0").collect()
    p = np.array(probe_row.scaled_vec)
    best = sorted(
        (
            round(1 - float(np.dot(p, np.array(r.scaled_vec)) /
                            (np.linalg.norm(p) * np.linalg.norm(np.array(r.scaled_vec)))), 4),
            r.description,
        )
        for r in all_rows
    )[:5]
    assert [(r.distance, r.description) for r in out] == best


def test_insufficient_data_gate(spark):
    tiny = spark.createDataFrame([(1.0, 2.0)] * 3, ["x", "y"])
    with pytest.raises(P.InsufficientDataError):
        P.train_kmeans(tiny, ["x", "y"])


def test_distilled_quality_classifier(spark, tmp_path):
    from bigdata_kafka_2_spark.ml.quality import (
        score_quality,
        train_quality_classifier,
    )
    from bigdata_kafka_2_spark.ml.pipelines import load_model, save_model
    from bigdata_kafka_2_spark.operators.text import quality_filter_flags

    d = read_table(spark, SF_DIR, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    held = d.filter(F.col("doc_id") % 5 == 0)

    model = train_quality_classifier(train, seed=1)
    scored = score_quality(model, held)
    rows = scored.select("doc_id", "quality_score").collect()
    assert len(rows) == held.count()
    assert all(0.0 <= r.quality_score <= 1.0 for r in rows)

    # the distilled score must actually separate the rule classes on
    # HELD-OUT docs: mean P(keep) of rule-kept docs well above rule-dropped
    truth = {
        r.doc_id: r.keep for r in quality_filter_flags(held).collect()
    }
    kept = [r.quality_score for r in rows if truth[r.doc_id]]
    dropped = [r.quality_score for r in rows if not truth[r.doc_id]]
    assert kept and dropped
    assert sum(kept) / len(kept) > sum(dropped) / len(dropped) + 0.2

    # uniform persistence (S9) round-trips the whole pipeline
    path = str(tmp_path / "quality_model")
    save_model(model, path)
    re_scored = score_quality(load_model(path), held)
    assert (
        sorted((r.doc_id, r.quality_score) for r in re_scored.select("doc_id", "quality_score").collect())
        == sorted((r.doc_id, r.quality_score) for r in rows)
    )


def test_word2vec_embeddings_deterministic_and_feed_similarity(
    spark, tmp_path
):
    """Seeded single-partition Word2Vec: fit twice -> byte-equal
    vectors (the seeded-ML invariant class); save/load roundtrip;
    doc embeddings drop into the similarity stack (cosine_topk)."""
    from bigdata_kafka_2_spark.io import read_table
    from bigdata_kafka_2_spark.ml.embeddings import (
        doc_embeddings,
        fit_word2vec,
    )
    from bigdata_kafka_2_spark.operators.similarity import cosine_topk
    from tests.conftest import SF_DIR

    d = read_table(spark, SF_DIR, "documents")
    m1 = fit_word2vec(d, dim=16)
    m2 = fit_word2vec(d, dim=16)
    v1 = {r.word: list(r.vector) for r in m1.getVectors().collect()}
    v2 = {r.word: list(r.vector) for r in m2.getVectors().collect()}
    assert v1 == v2 and len(v1) > 0

    p = str(tmp_path / "w2v")
    m1.save(p)
    from pyspark.ml.feature import Word2VecModel

    m3 = Word2VecModel.load(p)
    assert {
        r.word: list(r.vector) for r in m3.getVectors().collect()
    } == v1

    emb = doc_embeddings(m1, d).withColumnRenamed("doc_id", "vec_id")
    assert emb.count() == d.count()
    probe = emb.filter("vec_id = 0")
    top = cosine_topk(emb, probe, k=3).collect()
    assert len(top) == 3
    assert all(-1.0001 <= r.similarity <= 1.0001 for r in top)
    assert all(r.vec_id != 0 for r in top)
