"""Bucketed-table co-location: an equi-join of two tables bucketed on
the join key must plan with NO shuffle exchange — the write-once,
join-many amortization used for repeated fact-fact joins at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_bucketed, read_table, write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    l = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(l, "t_lineitem_b", "l_orderkey", 8, sort_by="l_orderkey")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_orders_b",
        "l_orderkey",
        8,
        sort_by="l_orderkey",
    )
    lb = read_bucketed(spark, "t_lineitem_b")
    ob = read_bucketed(spark, "t_orders_b")
    joined = lb.join(ob, on="l_orderkey")

    # at toy scale Catalyst would just broadcast (cheaper than using
    # the buckets); disable broadcast to surface the at-scale plan,
    # where bucketing must remove the shuffle on BOTH sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" in plan

    # and the result matches the plain (shuffled) join
    plain = l.join(
        o, l.l_orderkey == o.o_orderkey
    ).count()
    assert joined.count() == plain


def test_bucketed_aggregate_avoids_shuffle(spark, tmp_path):
    l = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(l, "t_li_agg_b", "l_orderkey", 8)
    lb = read_bucketed(spark, "t_li_agg_b")
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
