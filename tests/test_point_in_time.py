"""point_in_time_join: planted multi-version/gap fixture vs a
brute-force interval join, tie rule, and plan shape (no nested loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.cdc import point_in_time_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    dim = spark.createDataFrame(
        [
            # key 1: two versions, open-ended
            (1, 10.0, _ts("2024-01-01"), _ts("2024-01-10")),
            (1, 11.0, _ts("2024-01-10"), None),
            # key 2: one version CLOSED (churn) — gap after 01-05
            (2, 20.0, _ts("2024-01-01"), _ts("2024-01-05")),
            # key 3: never in dim
        ],
        ["k", "val", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-02")),   # v1
            (101, 1, _ts("2024-01-10")),   # exactly at boundary -> v2
            (102, 1, _ts("2024-02-01")),   # open v2
            (103, 2, _ts("2024-01-03")),   # inside closed version
            (104, 2, _ts("2024-01-05")),   # exactly at close -> gap
            (105, 2, _ts("2024-01-07")),   # gap
            (106, 3, _ts("2024-01-02")),   # unknown key
            (107, 1, _ts("2023-12-31")),   # before first version
        ],
        ["fid", "k", "ts"],
    )
    return facts, dim


def test_pit_matches_bruteforce(spark):
    facts, dim = _fixture(spark)
    out = {
        r["fid"]: (r["val"], r["__matched"])
        for r in point_in_time_join(facts, dim, ["k"]).collect()
    }
    brute = {
        r["fid"]: r["val"]
        for r in facts.join(
            dim,
            (facts.k == dim.k)
            & (dim.valid_from <= facts.ts)
            & (dim.valid_to.isNull() | (facts.ts < dim.valid_to)),
            "left",
        ).collect()
    }
    assert set(out) == set(brute)
    for fid, val in brute.items():
        got_val, matched = out[fid]
        assert got_val == val, fid
        assert matched == (val is not None), fid
    # explicit expectations for the planted cases
    assert out[100] == (10.0, True)
    assert out[101] == (11.0, True)   # boundary: NEW version wins
    assert out[102] == (11.0, True)
    assert out[103] == (20.0, True)
    assert out[104] == (None, False)  # ts == valid_to -> closed
    assert out[105] == (None, False)  # churn gap
    assert out[106] == (None, False)  # unknown key
    assert out[107] == (None, False)  # before first version


def test_pit_no_nested_loop(spark):
    """The as-of construction must plan as union + window — never a
    BroadcastNestedLoopJoin / CartesianProduct."""
    facts, dim = _fixture(spark)
    plan = (
        point_in_time_join(facts, dim, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan
