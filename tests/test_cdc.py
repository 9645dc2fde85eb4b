"""CDC operators: merge upsert semantics + SCD2 history correctness,
and the permissive corrupt-record accounting of the CSV reader."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_kafka_2_spark.io import read_csv_dir
from bigdata_kafka_2_spark.operators.cdc import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], ["k", "v", "ver"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 11), (2, "b3", 12), (4, "d", 11)], ["k", "v", "ver"]
    )
    out = {
        r.k: (r.v, r.ver)
        for r in merge_upsert(target, updates, ["k"], version_col="ver").collect()
    }
    assert out == {
        1: ("a", 10),     # untouched
        2: ("b3", 12),    # highest version of the dup update wins
        3: ("c", 10),
        4: ("d", 11),     # insert
    }


def test_scd2_apply(spark):
    ts = lambda s: datetime.fromisoformat(s)
    hist_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
            T.StructField("is_current", T.BooleanType()),
        ]
    )
    history = spark.createDataFrame(
        [
            (1, "v1", ts("2024-01-01"), None, True),
            (2, "w1", ts("2024-01-01"), None, True),
        ],
        hist_schema,
    )
    updates = spark.createDataFrame(
        [(1, "v2", ts("2024-02-01")), (1, "v3", ts("2024-03-01"))],
        ["k", "v", "ts"],
    )
    out = scd2_apply(history, updates, ["k"], "ts")
    rows = sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in out.collect()),
    )
    assert rows == [
        (1, "v1", ts("2024-01-01"), ts("2024-02-01"), False),
        (1, "v2", ts("2024-02-01"), ts("2024-03-01"), False),
        (1, "v3", ts("2024-03-01"), None, True),
        (2, "w1", ts("2024-01-01"), None, True),
    ]
    # exactly one current row per key
    cur = out.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_csv_corrupt_record_accounting(spark, tmp_path):
    # producer.py:96-105 bad-line counting, engine-side: PERMISSIVE mode
    # retains bad rows with the raw line in the corrupt column
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.csv").write_text(
        "id,val\n"
        "1,2.5\n"
        "not_an_int,3.5\n"
        "2,4.5\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("val", T.DoubleType(), True),
        ]
    )
    df = read_csv_dir(spark, str(p), schema=schema, corrupt_col="_bad").cache()
    assert df.count() == 3
    bad = df.filter(F.col("_bad").isNotNull())
    assert bad.count() == 1
    assert bad.collect()[0]._bad == "not_an_int,3.5"
    good = df.filter(F.col("_bad").isNull())
    assert {r.id for r in good.collect()} == {1, 2}


def test_apply_changes_last_op_wins(spark):
    from bigdata_kafka_2_spark.operators.cdc import apply_changes

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", "U", 1),   # simple update
            (2, "b2", "U", 1), (2, "b3", "U", 2),  # two updates: last wins
            (3, "c2", "U", 1), (3, None, "D", 2),  # update then delete
            (5, "e", "I", 1),    # insert of a new key
            (6, "f", "I", 1), (6, None, "D", 2),   # insert then delete: net nothing
        ],
        ["k", "v", "op", "version"],
    )
    got = {r.k: r.v for r in apply_changes(target, changes, ["k"]).collect()}
    assert got == {1: "a2", 2: "b3", 4: "d", 5: "e"}
