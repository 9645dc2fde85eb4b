"""MLlib LSH variants: approx Jaccard join recall vs the exact n-gram
join; BRP-LSH ANN sanity vs exact Euclidean top-k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.ml import lsh as L
from bigdata_kafka_2_spark.operators.dedup import ngram_jaccard_pairs
from tests.conftest import SF_DIR
from tests.test_extensions import _docs_with_near_dups


def test_mllib_minhash_recall_vs_exact(spark):
    docs = _docs_with_near_dups(spark)
    exact_strong = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        if r.id_b - r.id_a == 1_000_000
    }
    approx = {
        (r.id_a, r.id_b)
        for r in L.approx_jaccard_pairs(docs, threshold_distance=0.5).collect()
    }
    assert len(exact_strong) == 20
    found = exact_strong & approx
    assert len(found) >= 16  # ≥80% recall of strong near-dups


def test_brp_lsh_ann_vs_exact_euclidean(spark):
    e = read_table(spark, SF_DIR, "embeddings")
    rows = e.filter(F.col("vec_id") < 200).collect()
    probe = [float(x) for x in rows[0].embedding]

    def dist(v):
        return math.sqrt(sum((float(a) - b) ** 2 for a, b in zip(v, probe)))

    exact = sorted(
        ((dist(r.embedding), r.vec_id) for r in rows), key=lambda t: t[0]
    )[:5]
    exact_ids = {vid for _, vid in exact}

    got = L.approx_euclidean_neighbors(
        e.filter(F.col("vec_id") < 200), probe, k=5
    ).collect()
    got_ids = {r.vec_id for r in got}
    assert len(got_ids) == 5
    # probe itself (distance 0) must be found, plus most of the true top-k
    assert rows[0].vec_id in got_ids
    assert len(got_ids & exact_ids) >= 3
