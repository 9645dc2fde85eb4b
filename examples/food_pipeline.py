"""End-to-end food-nutrition pipeline — the engine-native equivalent of
the reference's four programs (producer → consumer → trainer → API,
SURVEY.md §3.1/§3.2), runnable as one script:

    python examples/food_pipeline.py [--rows 2000] [--workdir DIR]

Stages (each maps to a reference component):

1. PRODUCE   — synthesize a raw food CSV and emit it as JSON-lines
               messages (the producer's Kafka wire format,
               producer.py:28; a real deployment swaps the file sink
               for io.to_kafka_frame + the Kafka sink).
2. INGEST    — Structured Streaming drain of the message stream into
               conformed parquet batches (batch_writer_consumer.py
               semantics: earliest-offset, idle-drain, schema
               conformance; upgraded to exactly-once).
3. TRAIN     — the five cumulative-slice models
               (spark_model_trainer.py lifecycle, deterministic
               slices).
4. SERVE     — load all models uniformly and answer one request per
               model type + health (api.py lifecycle).

Prints a JSON summary per stage.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bigdata_kafka_2_spark import etl, get_spark, serving  # noqa: E402
from bigdata_kafka_2_spark.io import read_jsonl  # noqa: E402
from bigdata_kafka_2_spark.ml import knn, pipelines as P  # noqa: E402
from bigdata_kafka_2_spark.schema import (  # noqa: E402
    FOOD_NUMERIC_COLUMNS,
    FOOD_SCHEMA,
)
from bigdata_kafka_2_spark.streaming import ingest as ING  # noqa: E402


def produce(workdir: str, rows: int, seed: int = 42) -> str:
    """Stage 1: raw CSV → JSON-lines messages (producer semantics:
    project the 18 columns, coerce, emit one JSON object per row)."""
    rng = random.Random(seed)
    msg_dir = os.path.join(workdir, "messages")
    os.makedirs(msg_dir, exist_ok=True)
    raw_csv = os.path.join(workdir, "food.csv")
    cols = list(FOOD_NUMERIC_COLUMNS) + ["description"]
    with open(raw_csv, "w", newline="") as fh, open(
        os.path.join(msg_dir, "part0.jsonl"), "w"
    ) as out:
        w = csv.writer(fh)
        w.writerow(cols)
        for i in range(rows):
            protein = rng.uniform(0, 40)
            fat = rng.uniform(0, 30)
            carbs = rng.uniform(0, 60)
            kcal = 4 * protein + 9 * fat + 4 * carbs + rng.uniform(-20, 20)
            vals = [round(protein, 2), round(fat, 2), round(carbs, 2), round(kcal, 2)]
            vals += [round(rng.uniform(0, 100), 2) for _ in range(13)]
            row = dict(zip(cols, vals + [f"food item {i}"]))
            w.writerow(list(row.values()))
            # a few malformed messages exercise the §1.2 policy
            if i % 97 == 0:
                out.write("corrupted message\n")
            out.write(json.dumps(row) + "\n")
    return msg_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--workdir", default="/tmp/food_pipeline")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    spark = get_spark("food-pipeline")

    msg_dir = produce(args.workdir, args.rows)
    print(json.dumps({"stage": "produce", "messages_dir": msg_dir}))

    batches_dir = os.path.join(args.workdir, "batches")
    ckpt = os.path.join(args.workdir, "checkpoint")
    stream = ING.read_jsonl_stream(spark, msg_dir, FOOD_SCHEMA)
    ING.run_ingest(stream, batches_dir, ckpt)
    n_ingested = spark.read.parquet(batches_dir).count()
    print(json.dumps({"stage": "ingest", "rows": n_ingested}))

    # trainer expects CSV batches in the reference; the engine's
    # ingest_batches reads CSV — here we train straight from the
    # conformed parquet via the same slice/train path
    models_dir = os.path.join(args.workdir, "models")
    df = spark.read.parquet(batches_dir)
    from bigdata_kafka_2_spark.schema import conform_schema

    df = conform_schema(df, FOOD_SCHEMA)
    slices = etl.cumulative_slices(df, ["description"])
    saved = {}
    for (name, data, trainer) in [
        ("model_1_kmeans", slices[0], lambda d: P.train_kmeans(d, etl.CLUSTER_FEATURES)),
        ("model_2_kmeans", slices[1], lambda d: P.train_kmeans(d, etl.CLUSTER_FEATURES)),
        ("model_3_reco", slices[2], lambda d: P.train_scaled_features(d, etl.CLUSTER_FEATURES)),
        ("model_4_gbt_reg", slices[3], lambda d: P.train_gbt_regressor(d, etl.REGRESSION_FEATURES, etl.REGRESSION_LABEL)),
        ("model_5_gbt_clf", slices[4], lambda d: P.train_gbt_classifier(
            d, etl.CLASSIFICATION_FEATURES,
            df["Protein-G"] > P.HIGH_PROTEIN_THRESHOLD)),
    ]:
        path = os.path.join(models_dir, name)
        P.save_model(trainer(data), path)
        saved[name] = path
    print(json.dumps({"stage": "train", "models": sorted(saved)}))

    # the reference's producer DROPS bad lines (producer.py:96-99);
    # the engine retains them as default-filled rows instead — exclude
    # them from the serving table so recommendations are real items
    clean = df.filter(df["description"] != "Unknown")
    table = knn.knn_serving_table(P.load_model(saved["model_3_reco"]), clean)
    server = serving.ModelServer(
        spark,
        models_dir,
        {1: etl.CLUSTER_FEATURES, 2: etl.CLUSTER_FEATURES, 3: etl.CLUSTER_FEATURES,
         4: etl.REGRESSION_FEATURES, 5: etl.CLASSIFICATION_FEATURES},
        table,
    )
    sample = {
        "Protein-G": 25.0, "Total lipid (fat)-G": 10.0,
        "Carbohydrate, by difference-G": 30.0, "Energy-KCAL": 420.0,
    }
    results = {mid: server.predict(mid, sample) for mid in (1, 2, 3, 4, 5)}
    print(json.dumps({"stage": "serve", "health": server.health()["status"],
                      "predictions": results}, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
