"""The filelog Python DataSource: Kafka-semantics segmented log —
batch snapshot scan, streaming offsets, exactly-once restart, new
segments picked up incrementally (the S4 functional stand-in)."""

from __future__ import annotations

import pytest

from bigdata_kafka_2_spark.sources import register_filelog
from bigdata_kafka_2_spark.sources.filelog import append_records


@pytest.fixture()
def topic(tmp_path):
    d = str(tmp_path / "topic")
    append_records(d, [{"id": i, "v": i * 1.5} for i in range(10)], segment=0)
    append_records(d, [{"id": i, "v": 0.0} for i in range(10, 15)], segment=1)
    return d


def test_batch_read_scans_all_segments(spark, topic):
    register_filelog(spark)
    df = spark.read.format("filelog").option("path", topic).load()
    rows = df.collect()
    assert len(rows) == 15
    assert {r.segment for r in rows} == {0, 1}
    assert all(r.value.startswith("{") for r in rows)
    # per-segment line numbering = the (partition, offset) address
    assert sorted(r.line for r in rows if r.segment == 0) == list(range(10))


def test_stream_drain_then_incremental_append(spark, topic, tmp_path):
    register_filelog(spark)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("filelog")
            .option("path", topic)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == 15
    # restart with the same checkpoint, no new data: exactly-once
    drain()
    assert spark.read.parquet(sink).count() == 15
    # append to an existing segment AND roll a new one: only the
    # delta past the committed offsets is read
    append_records(topic, [{"id": 15}], segment=1)
    append_records(topic, [{"id": 16}, {"id": 17}], segment=2)
    drain()
    got = spark.read.parquet(sink)
    assert got.count() == 18
    assert got.filter("segment = 2").count() == 2
    # offsets are per-segment line addresses, so the late append to
    # segment 1 resumed at line 5
    assert got.filter("segment = 1").count() == 6
