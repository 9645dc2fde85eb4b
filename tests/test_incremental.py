"""Incremental aggregate state: merge == full recompute (any split),
parquet persistence roundtrip, and key asymmetry handling."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.incremental import (
    agg_state,
    finalize_agg_state,
    merge_agg_states,
)
from tests.conftest import SF_DIR


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _rows(df):
    return {
        r["event_type"]: (r["n"], r["sum4"], r["mean4"], r["var4"],
                          r["vmin"], r["vmax"])
        for r in df.collect()
    }


def test_merge_equals_full_recompute_any_split(spark):
    e = _events(spark)
    full = _rows(finalize_agg_state(agg_state(e, ["event_type"], "value")))
    # two different splits: by time, and by a hash (interleaved)
    for pred in (
        F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"),
        F.xxhash64("event_id") % 2 == 0,
    ):
        a = agg_state(e.filter(pred), ["event_type"], "value")
        b = agg_state(e.filter(~pred), ["event_type"], "value")
        merged = _rows(
            finalize_agg_state(merge_agg_states(a, b, ["event_type"]))
        )
        assert merged == full


def test_merge_handles_one_sided_keys(spark):
    """A key present only in one state must pass through unchanged."""
    a = agg_state(
        spark.createDataFrame([("x", 1.0), ("x", 3.0)], ["k", "value"]),
        ["k"],
        "value",
    )
    b = agg_state(
        spark.createDataFrame([("y", 10.0)], ["k", "value"]), ["k"], "value"
    )
    m = _rowmap(merge_agg_states(a, b, ["k"]))
    assert m["x"]["n"] == 2 and float(m["x"]["sum4"]) == 4.0
    assert m["y"]["n"] == 1 and float(m["y"]["sum4"]) == 10.0
    assert m["x"]["vmin"] == 1.0 and m["x"]["vmax"] == 3.0


def _rowmap(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def test_state_parquet_roundtrip(spark, tmp_path):
    """The operational claim: states persist as plain parquet (exact
    decimal columns included) and merge after reload."""
    e = _events(spark)
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    agg_state(e.filter(F.col("ts") < cut), ["event_type"], "value")\
        .write.parquet(p1)
    agg_state(e.filter(F.col("ts") >= cut), ["event_type"], "value")\
        .write.parquet(p2)
    merged = _rows(
        finalize_agg_state(
            merge_agg_states(
                spark.read.parquet(p1), spark.read.parquet(p2),
                ["event_type"],
            )
        )
    )
    full = _rows(finalize_agg_state(agg_state(e, ["event_type"], "value")))
    assert merged == full
    assert os.path.isdir(p1)


def test_write_with_metrics_single_pass(spark, tmp_path):
    from bigdata_kafka_2_spark.io import write_with_metrics

    e = _events(spark)
    out = str(tmp_path / "obs")
    m = write_with_metrics(
        e,
        out,
        {
            "null_values": F.count(F.when(F.col("value").isNull(), 1)),
            "sum_value4": F.sum(
                F.round("value", 4).cast("decimal(18,4)")
            ).cast("double"),
            "max_ts": F.max("ts"),
        },
    )
    n = spark.read.parquet(out).count()
    assert m["n_rows"] == n == e.count()
    agg = e.agg(
        F.count(F.when(F.col("value").isNull(), 1)),
        F.sum(F.round("value", 4).cast("decimal(18,4)")).cast("double"),
    ).collect()[0]
    assert m["null_values"] == agg[0]
    assert m["sum_value4"] == agg[1]
    assert m["max_ts"] is not None


def test_dataset_digest_order_independent_and_mergeable(spark):
    """The digest ignores row order and partitioning, changes under
    any content change, and merges across disjoint parts
    (digest(A∪B) = digest(A)+digest(B))."""
    from bigdata_kafka_2_spark.operators.incremental import (
        dataset_digest,
    )

    rows = [(i, f"name{i}", i % 3) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, name string, g long")
    d1 = dataset_digest(df).collect()[0]
    shuffled = df.orderBy(F.rand(7)).repartition(13)
    d2 = dataset_digest(shuffled).collect()[0]
    assert (d1.n_rows, d1.digest) == (d2.n_rows, d2.digest)
    # any content change moves the digest
    changed = spark.createDataFrame(
        rows[:-1] + [(99, "name99x", 0)], "k long, name string, g long"
    )
    assert dataset_digest(changed).collect()[0].digest != d1.digest
    # mergeable across disjoint parts
    a = dataset_digest(df.filter("k < 50")).collect()[0]
    b = dataset_digest(df.filter("k >= 50")).collect()[0]
    assert int(a.digest) + int(b.digest) == int(d1.digest)
    assert a.n_rows + b.n_rows == d1.n_rows
    # NULL is distinct from the string 'null'
    n1 = spark.createDataFrame([(1, None)], "k long, name string")
    n2 = spark.createDataFrame([(1, "null")], "k long, name string")
    assert (dataset_digest(n1).collect()[0].digest
            != dataset_digest(n2).collect()[0].digest)
    # empty frame digests to 0
    empty = dataset_digest(df.filter("k < 0")).collect()[0]
    assert empty.n_rows == 0 and empty.digest == "0"


def test_erasure_audit_digest_equals_purged_dataset_digest(spark):
    """The audit's released_digest IS dataset_digest of the anti-
    joined (purged) frame, and counts reconcile — the proof artifact
    contract."""
    from bigdata_kafka_2_spark.io import read_table
    from bigdata_kafka_2_spark.operators.incremental import (
        dataset_digest,
        erasure_audit,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    c = read_table(spark, SF_DIR, "customer")
    subjects = c.filter(F.col("c_custkey") % 7 == 0).select("c_custkey")
    cols = ["c_custkey", "c_name", "c_mktsegment"]
    audit = {
        r.table_name: r
        for r in erasure_audit(
            {"customer": (c, "c_custkey", cols)}, subjects
        ).collect()
    }["customer"]
    purged = c.join(subjects, on="c_custkey", how="left_anti")
    want = dataset_digest(purged, cols).collect()[0]
    assert audit.released_digest == want.digest
    assert audit.n_after == want.n_rows
    assert audit.n_before == c.count()
    assert audit.n_erased == c.count() - want.n_rows
    # mergeability: erased digest + released digest == full digest
    full = dataset_digest(c, cols).collect()[0]
    erased_rows = c.join(subjects, on="c_custkey", how="left_semi")
    erased = dataset_digest(erased_rows, cols).collect()[0]
    assert int(erased.digest) + int(audit.released_digest) == int(
        full.digest
    )
