"""Connected-components dedup clustering + end-to-end near_dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import dedup as DD
from tests.conftest import SF_DIR
from tests.test_extensions import _docs_with_near_dups


def test_dedup_clusters_chain_and_singletons(spark):
    # chain 1-2-3, pair 10-11, singletons 20, 21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20, 21]], ["doc_id"])
    out = {r.doc_id: r.cluster_rep for r in DD.dedup_clusters(pairs, ids).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 21}


def test_dedup_clusters_long_chain_converges(spark):
    # a 12-node path graph needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    out = {r.doc_id: r.cluster_rep for r in DD.dedup_clusters(pairs, ids).collect()}
    assert all(v == 0 for v in out.values())
    assert len(out) == 12


def test_near_dedup_end_to_end(spark):
    docs = _docs_with_near_dups(spark)  # driver docs + 20 synthetic dups
    n_before = docs.count()
    kept = DD.near_dedup(docs, est_threshold=0.5)
    n_after = kept.count()
    # at least the 20 synthetic near-dups' worth of rows removed (the
    # driver docs also contain natural near-dup pairs — removed too)
    assert n_before - n_after >= 16
    # survivors must be EXACTLY the cluster representatives (min id per
    # connected component of the pair graph)
    pairs = DD.minhash_lsh_pairs(docs, verify_threshold=0.5)
    clusters = DD.dedup_clusters(pairs, docs.select("doc_id"))
    reps = {
        r.cluster_rep for r in clusters.select("cluster_rep").distinct().collect()
    }
    survivors = {r.doc_id for r in kept.select("doc_id").collect()}
    assert survivors == reps
    # every synthetic dup (offset id) is gone — its original shares the
    # cluster and has the smaller id
    assert not any(s >= 1_000_000 for s in survivors)
