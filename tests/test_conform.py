"""conform_schema semantics (SURVEY.md §1.2) — the load-bearing
missing-data policy: coerce-don't-propagate, 0.0/'Unknown' defaults,
synthesize missing columns, drop extras."""

from __future__ import annotations

from pyspark.sql import types as T

from bigdata_kafka_2_spark.schema import FOOD_SCHEMA, conform_schema

SMALL = T.StructType(
    [
        T.StructField("a", T.DoubleType(), True),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.LongType(), True),
    ]
)


def test_null_numeric_fills_zero(spark):
    df = spark.createDataFrame([("1.5", "x", 7), (None, None, None)], ["a", "b", "c"])
    out = conform_schema(df, SMALL).collect()
    assert out[0].a == 1.5 and out[0].b == "x" and out[0].c == 7
    assert out[1].a == 0.0 and out[1].b == "Unknown" and out[1].c == 0


def test_unparseable_numeric_fills_zero(spark):
    df = spark.createDataFrame([("not-a-number", "y", "12"), ("2e1", "z", "x")], ["a", "b", "c"])
    out = conform_schema(df, SMALL).collect()
    assert out[0].a == 0.0 and out[0].c == 12
    assert out[1].a == 20.0 and out[1].c == 0


def test_missing_column_synthesized(spark):
    df = spark.createDataFrame([("q",)], ["b"])
    out = conform_schema(df, SMALL).collect()[0]
    assert out.a == 0.0 and out.b == "q" and out.c == 0


def test_extra_column_dropped_and_order_canonical(spark):
    df = spark.createDataFrame([(1.0, "x", 2, "junk")], ["c", "b", "a", "zz"])
    out = conform_schema(df, SMALL)
    assert out.columns == ["a", "b", "c"]
    row = out.collect()[0]
    # values followed their NAMES (select by name), not positions
    assert row.a == 2.0 and row.b == "x" and row.c == 1


def test_timestamp_and_complex_types_pass_through(spark):
    from datetime import datetime

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("arr", T.ArrayType(T.DoubleType()), True),
            T.StructField("a", T.DoubleType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(datetime(2024, 1, 2, 3, 4, 5), [1.0, 2.0], None), (None, None, 7.5)],
        schema,
    )
    out = conform_schema(df, schema).collect()
    # non-scalar types: cast-through, null preserved (no fabricated
    # defaults for timestamps/arrays — only numeric/string get them)
    assert out[0].ts == datetime(2024, 1, 2, 3, 4, 5)
    assert list(out[0].arr) == [1.0, 2.0]
    assert out[0].a == 0.0
    assert out[1].ts is None and out[1].arr is None and out[1].a == 7.5


def test_food_schema_full_conformance(spark):
    # one row with only 2 of the 18 food columns present
    df = spark.createDataFrame([(33.0, "Cheddar")], ["Protein-G", "description"])
    out = conform_schema(df, FOOD_SCHEMA)
    assert len(out.columns) == 18
    row = out.collect()[0]
    assert row["Protein-G"] == 33.0
    assert row["description"] == "Cheddar"
    assert row["Energy-KCAL"] == 0.0
