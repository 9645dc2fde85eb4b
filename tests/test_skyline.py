"""skyline_2d: brute-force dominance parity, tie semantics, NULL
exclusion, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.relational import skyline_2d
from tests.conftest import SF_DIR


def test_skyline_equals_bruteforce_dominance(spark):
    """The definition, verified independently: skyline == rows with no
    dominator (p.x >= q.x and p.y >= q.y, strict in one)."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey",
        F.col("o_totalprice").alias("x"),
        F.col("o_orderdate").alias("y"),
    )
    got = {r["o_orderkey"] for r in skyline_2d(o, "x", "y").collect()}
    rows = o.collect()
    pts = [(r["o_orderkey"], r["x"], r["y"]) for r in rows]
    brute = {
        k
        for k, x, y in pts
        if not any(
            px >= x and py >= y and (px > x or py > y)
            for _, px, py in pts
        )
    }
    assert got == brute
    assert brute, "fixture frontier should be non-empty"


def test_skyline_ties_and_nulls(spark):
    d = spark.createDataFrame(
        [
            (1, 5.0, 5.0),
            (2, 5.0, 5.0),   # exact duplicate of the frontier point
            (3, 5.0, 4.0),   # same x, worse y -> dominated
            (4, 4.0, 6.0),   # frontier (better y)
            (5, 4.0, 6.0),   # duplicate again
            (6, 3.0, 3.0),   # dominated
            (7, None, 9.0),  # NULL x excluded
            (8, 9.0, None),  # NULL y excluded
        ],
        ["id", "x", "y"],
    )
    got = {r["id"] for r in skyline_2d(d, "x", "y").collect()}
    assert got == {1, 2, 4, 5}


def test_skyline_plan_no_single_partition(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_totalprice").alias("x"), F.col("o_orderdate").alias("y")
    )
    plan = (
        skyline_2d(o, "x", "y")._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "Cartesian" not in plan
    # the one BroadcastNestedLoopJoin is the bounded <=64-row bucket
    # maxima triangle join (the global_row_number offset pattern) —
    # never a data-sized join
    assert plan.count("BroadcastNestedLoopJoin") <= 1
