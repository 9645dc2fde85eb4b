"""Physical-plan regressions for the round-2 scale fixes: operators
that used to funnel the whole dataset through one task (global
``Window.orderBy`` with no partition key) must now plan a
hash-partitioned window — no ``Exchange SinglePartition`` anywhere in
the ranking/carry path."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import relational as R
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cumulative_slice_no_single_partition_window(spark):
    l = read_table(spark, SF_DIR, "lineitem")
    out = R.cumulative_slice(l, ["l_orderkey", "l_linenumber"], 1000)
    plan = _plan(out)
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__bkt" in plan


def test_cumulative_slice_matches_global_sort(spark):
    l = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    got = [
        (r.l_orderkey, r.l_linenumber)
        for r in R.cumulative_slice(l, ["l_orderkey", "l_linenumber"], 500)
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    ]
    want = [
        (r.l_orderkey, r.l_linenumber)
        for r in l.orderBy("l_orderkey", "l_linenumber").limit(500).collect()
    ]
    assert got == want


def test_global_row_number_is_dense_and_ordered(spark):
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey")
    ranked = R.global_row_number(o, "o_orderkey", rn_col="rn")
    rows = ranked.orderBy("rn").collect()
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    keys = [r.o_orderkey for r in rows]
    assert keys == sorted(keys)


def test_unkeyed_asof_join_no_single_partition_window(spark):
    o = (
        read_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 50)
        .select("o_orderkey", "o_orderdate")
    )
    e = (
        read_table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            (
                F.lit("1995-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(days=F.col("event_id") % 2000)
            ).alias("ets"),
        )
    )
    out = R.asof_join(
        o, e, left_ts="o_orderdate", right_ts="ets", right_cols=["event_id"]
    )
    plan = _plan(out)
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__bkt" in plan


def test_ivf_centroid_partitioned_layout_prunes_scan(spark, tmp_path):
    """The IVF scale path: vectors written partitioned by centroid_id,
    a probe restricted to n_probe cells must prune non-probed cells at
    the FILE level (PartitionFilters on centroid_id)."""
    from bigdata_kafka_2_spark.io import write_parquet
    from bigdata_kafka_2_spark.operators import similarity as SIM

    e = read_table(spark, SF_DIR, "embeddings")
    cents = e.filter(F.col("vec_id").isin([10, 20, 30, 40])).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    assigned = SIM.assign_centroids(e, cents)
    out = str(tmp_path / "ivf_cells")
    write_parquet(assigned, out, partition_by=["centroid_id"])

    probed = spark.read.parquet(out).filter(F.col("centroid_id").isin([10, 20]))
    plan = _plan(probed)
    assert "PartitionFilters" in plan
    files = probed.select(F.input_file_name().alias("f")).distinct().collect()
    assert files
    assert all(
        "centroid_id=10" in r.f or "centroid_id=20" in r.f for r in files
    )


def test_salted_join_plan_shows_salt_expansion(spark):
    """q58's plan must actually join on (key, __salt) with the dim side
    replicated via explode(sequence(...)) — i.e. the salt is in the
    physical plan, not just the API."""
    from bigdata_kafka_2_spark.plans import load_all

    reg = load_all()
    df = reg["q58_salted_join"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "__salt" in plan
    assert "Generate explode" in plan
