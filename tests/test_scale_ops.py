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
