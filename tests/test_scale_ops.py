"""Scale-path operators: salted join equivalence, approximate
aggregates within tolerance of exact (the sketch-based 100 TB paths
that cannot be oracle-hashed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators.relational import dim_join, salted_join
from tests.conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    l = read_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    p = read_table(spark, SF_DIR, "part")
    plain = (
        dim_join(l, p, on="p_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(l, p, key="p_partkey", salt_buckets=8)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    a = {(r.p_brand): (r.n, r.q) for r in plain.collect()}
    b = {(r.p_brand): (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_approx_count_distinct_tolerance(spark):
    l = read_table(spark, SF_DIR, "lineitem")
    exact = l.select(F.countDistinct("l_partkey").alias("n")).collect()[0].n
    approx = l.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) / exact < 0.1


def test_percentile_approx_tolerance(spark):
    l = read_table(spark, SF_DIR, "lineitem")
    exact = l.select(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p")
    ).collect()[0].p
    approx = l.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p")
    ).collect()[0].p
    assert abs(approx - exact) / exact < 0.05


def test_near_dedup_10x_scale_invariant(spark):
    """10x-scaled near-dedup smoke: union ten id-shifted copies of the
    documents table (identical text). Copies share exact shingle sets,
    so every original near-dup relation is preserved verbatim and each
    copy clusters with its original — the survivor set at 10x must
    EQUAL the survivor set at 1x (min ids are the originals). Exercises
    LSH banding, the verify join, and connected components on clusters
    10x wider, with no cliff."""
    from bigdata_kafka_2_spark.operators.dedup import near_dedup

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    shift = 1_000_000
    scaled = docs
    for i in range(1, 10):
        scaled = scaled.unionByName(
            docs.select(
                (F.col("doc_id") + i * shift).alias("doc_id"), "text"
            )
        )
    base = {r.doc_id for r in near_dedup(docs, verify=True).collect()}
    big = {r.doc_id for r in near_dedup(scaled, verify=True).collect()}
    assert big == base  # all survivors are originals, same clusters


def test_hll_sketch_shards_merge_to_whole(spark):
    """Built-in HLL sketches (hll_sketch_agg/hll_union_agg): per-shard
    sketches merged give EXACTLY the same estimate as one sketch over
    the whole table — the mergeable distinct-count summary that replaces
    a full-vocabulary distinct at 100 TB (map-side partials + tiny
    fixed-size state, same contract as the count-min sketch for sums)."""
    l = read_table(spark, SF_DIR, "lineitem").select("l_partkey")
    whole = l.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("n")
    ).first()["n"]
    sharded = (
        l.withColumn("shard", F.pmod(F.xxhash64("l_partkey"), F.lit(4)))
        .groupBy("shard")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .first()["n"]
    )
    assert sharded == whole
    exact = l.distinct().count()
    assert abs(whole - exact) / exact < 0.05
