"""Streaming tests (SURVEY.md §5.4): drain semantics, exactly-once
restart, conformance of bad input, event-time windows with watermark,
session windows, custom stateful operator."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.streaming import ingest as ING
from bigdata_kafka_2_spark.streaming import windows as SW
from tests.conftest import SF_DIR

MSG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("label", T.StringType(), True),
    ]
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "part0.jsonl", "w") as fh:
        for i in range(50):
            fh.write(json.dumps({"id": i, "value": i * 1.5, "label": f"x{i}"}) + "\n")
        fh.write("this is not json\n")  # bad line → default-filled row
        fh.write(json.dumps({"id": 50}) + "\n")  # partial → defaults
    return d


def test_ingest_drain_conform_exactly_once(spark, jsonl_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = ING.read_jsonl_stream(spark, str(jsonl_dir), MSG_SCHEMA)
    ING.run_ingest(stream, out, ckpt)

    got = spark.read.parquet(out)
    assert got.count() == 52
    # bad line conformed to defaults, not dropped/nulled (§1.2 policy)
    defaults = got.filter((F.col("label") == "Unknown") & (F.col("value") == 0.0))
    assert defaults.count() == 2  # the non-JSON line + id-only line (value/label defaulted)
    assert got.filter(F.col("id") == 50).count() == 1

    # restart with same checkpoint + one new file → ONLY new rows appended
    with open(jsonl_dir / "part1.jsonl", "w") as fh:
        for i in range(100, 110):
            fh.write(json.dumps({"id": i, "value": 1.0, "label": "new"}) + "\n")
    stream2 = ING.read_jsonl_stream(spark, str(jsonl_dir), MSG_SCHEMA)
    ING.run_ingest(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == 62  # 52 + 10, no reprocessing


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    read_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(d)
    return d


def _drain_to_memory(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_match_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    # complete mode: emit ALL windows including those still within the
    # watermark (append would hold back the stream's final day)
    _drain_to_memory(
        SW.windowed_counts(stream, "1 day", watermark="1 hour"), "win_out", "complete"
    )
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("select * from win_out").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            spark.read.parquet(events_stream_dir)
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        ).collect()
    }
    # availableNow + watermark: every window whose watermark passed is
    # emitted; with a final drain all windows equal the batch result
    assert streamed == batch


def test_session_window_smoke(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    _drain_to_memory(SW.session_aggregate(stream), "sess_out", "complete")
    rows = spark.sql("select * from sess_out").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)
    # per-user session event totals == per-user event counts
    per_user_sessions = {}
    for r in rows:
        per_user_sessions[r.user_id] = per_user_sessions.get(r.user_id, 0) + r.n_events
    per_user_batch = {
        r.user_id: r.n
        for r in spark.read.parquet(events_stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_user_sessions == per_user_batch


def test_watermark_drops_too_late_events(spark, tmp_path):
    # §2.9 late-data semantics: the watermark persists in the
    # checkpoint across drains; a row far behind it is dropped (Spark's
    # numRowsDroppedByWatermark metric) and never mutates its window.
    d = tmp_path / "late"
    d.mkdir()
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .json(str(d))
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = 0
        for p in q.recentProgress:
            for op in p.get("stateOperators", []):
                dropped += op.get("numRowsDroppedByWatermark", 0)
        return dropped

    with open(d / "b0.jsonl", "w") as fh:
        fh.write(json.dumps({"ts": "2024-01-01 10:00:00", "v": 1.0}) + "\n")
        fh.write(json.dumps({"ts": "2024-01-01 18:00:00", "v": 1.0}) + "\n")
    assert drain() == 0  # nothing late yet; watermark now 16:00 in ckpt

    with open(d / "b1.jsonl", "w") as fh:
        fh.write(json.dumps({"ts": "2024-01-01 17:30:00", "v": 1.0}) + "\n")  # ok
        fh.write(json.dumps({"ts": "2024-01-01 10:30:00", "v": 1.0}) + "\n")  # late
    assert drain() == 1  # exactly the too-late row was dropped

    # finalized output: the 10:00 window closed with n=1 — the dropped
    # row never mutated it
    final = {str(r.ws): r.n for r in spark.read.parquet(out).collect()}
    assert final.get("2024-01-01 10:00:00") == 1


def test_counted_batches_exact_chunks(spark, tmp_path):
    # S5 parity: 5000 rows at batch_size=2000 → chunks of 2000/2000/1000
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "rows.jsonl", "w") as fh:
        for i in range(5000):
            fh.write(json.dumps({"id": i, "value": 1.0, "label": "x"}) + "\n")
    stream = ING.read_jsonl_stream(spark, str(d), MSG_SCHEMA)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ING.run_ingest_counted(stream, out, ckpt, order_col="id", batch_size=2000)

    got = spark.read.option("header", "true").csv(out)
    assert got.count() == 5000
    sizes = sorted(
        r.n for r in got.groupBy("chunk").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sizes == [1000, 2000, 2000]
    # chunking followed the total order: chunk 0 holds ids 0..1999
    chunk0 = got.filter(F.col("chunk") == 0).select(F.col("id").cast("long"))
    assert chunk0.agg(F.max("id")).collect()[0][0] == 1999


def test_stateful_running_stats_accumulates(spark, tmp_path):
    # two input files + maxFilesPerTrigger=1 → two micro-batches; the
    # per-user state must carry across them
    d = tmp_path / "ev"
    d.mkdir()
    rows1 = [{"user_id": 1, "value": 10.0}, {"user_id": 1, "value": 95.0}]
    rows2 = [{"user_id": 1, "value": 99.0}, {"user_id": 2, "value": 5.0}]
    for i, rows in enumerate([rows1, rows2]):
        with open(d / f"f{i}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    _drain_to_memory(SW.running_user_stats(stream, threshold=90.0), "state_out", "update")
    rows = spark.sql("select * from state_out").collect()
    # final state for user 1: 3 events, 10+95+99, 2 over threshold
    final_u1 = max(
        (r for r in rows if r.user_id == 1), key=lambda r: r.n_events
    )
    assert final_u1.n_events == 3
    assert final_u1.total_value == 204.0
    assert final_u1.n_over == 2
    final_u2 = max((r for r in rows if r.user_id == 2), key=lambda r: r.n_events)
    assert final_u2.n_events == 1 and final_u2.n_over == 0


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    # at-least-once source simulation: the same (event_id) is delivered
    # in two different micro-batches; dropDuplicatesWithinWatermark must
    # emit it once. maxFilesPerTrigger=1 → one file per micro-batch.
    d = tmp_path / "dup_ev"
    d.mkdir()
    rows1 = [
        {"event_id": 1, "ts": "2024-06-01 10:00:00", "value": 1.0},
        {"event_id": 2, "ts": "2024-06-01 10:01:00", "value": 2.0},
        {"event_id": 1, "ts": "2024-06-01 10:00:00", "value": 1.0},  # in-batch dup
    ]
    rows2 = [
        {"event_id": 2, "ts": "2024-06-01 10:01:00", "value": 2.0},  # redelivery
        {"event_id": 3, "ts": "2024-06-01 10:02:00", "value": 3.0},
    ]
    for i, rows in enumerate([rows1, rows2]):
        with open(d / f"f{i}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = SW.dedup_stream(stream, ["event_id"], watermark="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select event_id from dedup_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3]
    # bounded state: one entry per distinct key within the horizon
    state = q.lastProgress["stateOperators"][0]
    assert state["numRowsTotal"] == 3


def test_reconcile_stage_rebuilds_on_layout_change(tmp_path):
    """r7 advice: the persistent symlink stage dir must reconcile with
    the CURRENT source layout — broken links (regenerated source),
    renamed part files, and stale extra links all force a rebuild
    instead of FileExistsError / silent duplication."""
    import os

    from bigdata_kafka_2_spark.plans.streaming_queries import _reconcile_stage

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.parquet").write_bytes(b"A")
    (src / "b.parquet").write_bytes(b"B")
    stage = str(tmp_path / "stage")

    exp = {
        "events_0.parquet": str(src / "a.parquet"),
        "events_1.parquet": str(src / "b.parquet"),
    }
    _reconcile_stage(stage, exp)
    assert sorted(os.listdir(stage)) == sorted(exp)
    # idempotent: second call leaves the links untouched
    inode = os.lstat(os.path.join(stage, "events_0.parquet")).st_ino
    _reconcile_stage(stage, exp)
    assert os.lstat(os.path.join(stage, "events_0.parquet")).st_ino == inode

    # source regenerated: old files gone, new file set -> broken links
    # must NOT raise and the stale extra link must disappear
    os.remove(src / "a.parquet")
    os.remove(src / "b.parquet")
    (src / "c.parquet").write_bytes(b"C")
    exp2 = {"events_0.parquet": str(src / "c.parquet")}
    _reconcile_stage(stage, exp2)
    assert os.listdir(stage) == ["events_0.parquet"]
    assert os.path.realpath(os.path.join(stage, "events_0.parquet")) == str(
        src / "c.parquet"
    )


def test_streaming_upsert_multibatch_and_restart(spark, tmp_path):
    """run_streaming_upsert converges to the global per-key argmax
    regardless of batching (one file per micro-batch here, so merges
    genuinely cross batches), and a re-run over the same checkpoint
    (simulated restart) leaves the table unchanged."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        # key, order, payload — later files carry EARLIER orders too,
        # so cross-batch precedence (not arrival order) must decide
        (1, 10, "a"), (2, 5, "b"),
        (1, 30, "c"), (3, 1, "d"),
        (1, 20, "e"), (2, 50, "f"), (3, 1, "g_dup_order"),
    ]
    for i in range(3):
        pd.DataFrame(
            rows[i * 2 : i * 2 + (2 if i < 2 else 3)],
            columns=["k", "o", "p"],
        ).to_parquet(src / f"f{i}.parquet")
    schema = "k bigint, o bigint, p string"
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ING.run_streaming_upsert(stream, table, ckpt, ["k"], ["o"])
    got = {
        r.k: (r.o, r.p) for r in spark.read.parquet(table).collect()
    }
    assert got[1] == (30, "c")
    assert got[2] == (50, "f")
    assert got[1 + 2][0] == 1  # key 3: one of the order-tied rows

    # restart over the same checkpoint: no new input → table unchanged
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ING.run_streaming_upsert(stream2, table, ckpt, ["k"], ["o"])
    again = {
        r.k: (r.o, r.p) for r in spark.read.parquet(table).collect()
    }
    assert again == got


def test_drain_with_metrics_accounts_for_every_input_row(spark, tmp_path):
    """recentProgress-derived metrics: input-row totals equal the
    staged source exactly; windowed state is visible as state rows."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        pd.DataFrame(
            {"k": [1, 2, 3], "v": [float(i)] * 3}
        ).to_parquet(src / f"f{i}.parquet")
    stream = (
        spark.readStream.schema("k bigint, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = stream.groupBy("k").count()
    sink, metrics = ING.drain_with_metrics(agg, "metrics_sink_t")
    assert spark.table(sink).count() == 3
    assert sum(m["numInputRows"] for m in metrics) == 9
    assert any(m["stateRows"] > 0 for m in metrics)
    assert all(m["durationMs"] is not None for m in metrics)


def test_transform_with_state_matches_v1(spark, tmp_path):
    """Spark 4 transformWithStateInPandas twin: identical final state
    to the applyInPandasWithState operator on the same two-batch
    stream. SKIPs where the API's protobuf-RPC worker can't run
    (this sandbox ships a broken google.protobuf)."""
    import pytest

    if not SW.transform_with_state_available():
        pytest.skip("transformWithStateInPandas env-blocked: "
                    "google.protobuf broken in sandbox")
    d = tmp_path / "tws_ev"
    d.mkdir()
    rows1 = [{"user_id": 1, "value": 10.0}, {"user_id": 1, "value": 95.0}]
    rows2 = [{"user_id": 1, "value": 99.0}, {"user_id": 2, "value": 5.0}]
    for i, rows in enumerate([rows1, rows2]):
        with open(d / f"f{i}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    _drain_to_memory(
        SW.running_user_stats_v2(stream, threshold=90.0),
        "tws_out",
        "update",
    )
    rows = spark.sql("select * from tws_out").collect()
    final_u1 = max(
        (r for r in rows if r.user_id == 1), key=lambda r: r.n_events
    )
    assert final_u1.n_events == 3
    assert final_u1.total_value == 204.0
    assert final_u1.n_over == 2
    final_u2 = max(
        (r for r in rows if r.user_id == 2), key=lambda r: r.n_events
    )
    assert final_u2.n_events == 1 and final_u2.n_over == 0


def test_streaming_bucket_counts_exclude_nulls(spark, tmp_path):
    """The drift monitor's bucketizer drops NULL values instead of
    folding them into bucket 0 (mirrors psi_drift's fix): 10 real
    values spread over [0, 10) plus 5 NULLs yield bucket counts that
    sum to 10."""
    src = str(tmp_path / "src")
    rows = [(float(i),) for i in range(10)] + [(None,)] * 5
    spark.createDataFrame(rows, "value double").write.parquet(src)
    stream = spark.readStream.schema("value double").parquet(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ING.run_streaming_bucket_counts(
        stream, "value", 0.0, 10.0, 5, state, ckpt
    )
    got = {
        r.bucket: r.n
        for r in ING.read_bucket_counts(spark, state).collect()
    }
    assert got == {b: 2 for b in range(5)}


def test_streaming_digest_matches_batch_and_dedups_replay(spark, tmp_path):
    """The streamed digest equals the batch digest of the same rows;
    a replayed epoch's re-appended partials don't change the merge;
    a content difference (not just a count difference) is caught."""
    from bigdata_kafka_2_spark.operators.incremental import dataset_digest
    from bigdata_kafka_2_spark.streaming.ingest import (
        read_streaming_digest,
        run_streaming_digest,
    )

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, f"u{i % 5}") for i in range(40)], "k long, u string"
    )
    df.write.parquet(src)
    stream = spark.readStream.schema("k long, u string").parquet(src)
    state = str(tmp_path / "state")
    run_streaming_digest(stream, ["k", "u"], state, str(tmp_path / "ck"))
    got = read_streaming_digest(spark, state).collect()[0]
    want = dataset_digest(df, ["k", "u"]).collect()[0]
    assert (got.n_rows, got.digest) == (want.n_rows, want.digest)
    # replayed epoch: identical partials re-appended -> unchanged
    spark.read.parquet(state).write.mode("append").parquet(state)
    got2 = read_streaming_digest(spark, state).collect()[0]
    assert (got2.n_rows, got2.digest) == (want.n_rows, want.digest)
    # swap one row's content for another duplicate of an existing row:
    # count unchanged, digest moves
    swapped = spark.createDataFrame(
        [(i if i != 39 else 0, f"u{(i if i != 39 else 0) % 5}")
         for i in range(40)],
        "k long, u string",
    )
    other = dataset_digest(swapped, ["k", "u"]).collect()[0]
    assert other.n_rows == want.n_rows and other.digest != want.digest


def test_streaming_scd2_intervals_and_restart(spark, tmp_path):
    """run_streaming_scd2 derives validity intervals from the version
    SET: multi-batch delivery (one file per micro-batch) converges to
    the same history as a single-batch apply, an out-of-order EARLIER
    version arriving in a later batch is spliced into its timestamp
    position (which close-at-append scd2_apply cannot repair), and a
    checkpoint-recovery re-run leaves the table unchanged."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    t = pd.Timestamp
    files = [
        # (key, ts, payload) — key 1 gets its MIDDLE version last
        [(1, t("2024-01-01"), "a1"), (2, t("2024-01-01"), "b1")],
        [(1, t("2024-09-01"), "a3"), (2, t("2024-05-01"), "b2")],
        [(1, t("2024-05-01"), "a2")],  # out-of-order splice
    ]
    for i, rows in enumerate(files):
        pd.DataFrame(rows, columns=["k", "ts", "p"]).to_parquet(
            src / f"f{i}.parquet", coerce_timestamps="us"
        )
    schema = "k bigint, ts timestamp, p string"
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ING.run_streaming_scd2(stream, table, ckpt, ["k"], "ts")

    def snap():
        return sorted(
            (
                r.k,
                r.p,
                str(r.valid_from)[:10],
                str(r.valid_to)[:10] if r.valid_to else None,
                r.is_current,
            )
            for r in spark.read.parquet(table).collect()
        )

    got = snap()
    assert got == [
        (1, "a1", "2024-01-01", "2024-05-01", False),
        (1, "a2", "2024-05-01", "2024-09-01", False),
        (1, "a3", "2024-09-01", None, True),
        (2, "b1", "2024-01-01", "2024-05-01", False),
        (2, "b2", "2024-05-01", None, True),
    ]

    # restart over the same checkpoint: no new input -> unchanged
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ING.run_streaming_scd2(stream2, table, ckpt, ["k"], "ts")
    assert snap() == got

    # fresh checkpoint over the SAME source (full replay against the
    # existing table): duplicate versions collapse, table unchanged
    stream3 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ING.run_streaming_scd2(
        stream3, table, str(tmp_path / "ckpt2"), ["k"], "ts"
    )
    assert snap() == got


def test_streaming_scd2_equals_single_batch(spark, tmp_path):
    """Any batching converges: one-file-per-batch delivery produces a
    table identical to delivering everything in a single batch."""
    import pandas as pd

    rows = [
        (k, pd.Timestamp(f"2024-0{v}-01"), f"p{k}v{v}")
        for k in range(1, 8)
        for v in (1, 3, 2)  # deliberately not in ts order
    ]

    def run(src_dir, table, ckpt, per_trigger):
        stream = (
            spark.readStream.schema("k bigint, ts timestamp, p string")
            .option("maxFilesPerTrigger", per_trigger)
            .parquet(str(src_dir))
        )
        ING.run_streaming_scd2(stream, str(table), str(ckpt), ["k"], "ts")
        return sorted(
            (r.k, r.p, str(r.valid_from), str(r.valid_to), r.is_current)
            for r in spark.read.parquet(str(table)).collect()
        )

    multi = tmp_path / "multi"
    multi.mkdir()
    for i in range(7):
        pd.DataFrame(
            rows[i * 3 : i * 3 + 3], columns=["k", "ts", "p"]
        ).to_parquet(multi / f"f{i}.parquet", coerce_timestamps="us")
    single = tmp_path / "single"
    single.mkdir()
    pd.DataFrame(rows, columns=["k", "ts", "p"]).to_parquet(
        single / "all.parquet", coerce_timestamps="us"
    )
    a = run(multi, tmp_path / "t1", tmp_path / "c1", 1)
    b = run(single, tmp_path / "t2", tmp_path / "c2", 100)
    assert a == b and len(a) == 21


def test_streaming_erasure_idempotent_and_digest_consistent(spark, tmp_path):
    """Purge-as-a-stream: multi-batch erasure converges to the anti-
    join table, the latest audit digest equals dataset_digest of the
    live table, replay over a fresh checkpoint erases nothing new and
    reproduces the same digest."""
    import pandas as pd

    from bigdata_kafka_2_spark.operators.incremental import (
        dataset_digest,
    )

    table = str(tmp_path / "table")
    audit = str(tmp_path / "audit")
    spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], "k long, name string"
    ).write.parquet(table)
    src = tmp_path / "req"
    src.mkdir()
    pd.DataFrame({"k": [1, 5, 9]}).to_parquet(src / "a.parquet")
    pd.DataFrame({"k": [5, 50, 77]}).to_parquet(src / "b.parquet")

    def stream():
        return (
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    ING.run_streaming_erasure(
        stream(), table, str(tmp_path / "c1"), "k", ["k", "name"], audit
    )
    verdict = ING.read_erasure_audit(spark, audit).collect()[0]
    live = spark.read.parquet(table)
    assert verdict.n_erased_total == 5  # k=5 erased once only
    assert verdict.n_remaining == 95 == live.count()
    want = dataset_digest(live, ["k", "name"]).collect()[0]
    assert verdict.released_digest == want.digest
    assert live.filter(F.col("k").isin([1, 5, 9, 50, 77])).count() == 0

    # full replay, fresh checkpoint: nothing new erased, same digest
    ING.run_streaming_erasure(
        stream(), table, str(tmp_path / "c2"), "k", ["k", "name"], audit
    )
    v2 = ING.read_erasure_audit(spark, audit).collect()[0]
    assert v2.n_remaining == 95
    assert v2.released_digest == verdict.released_digest


def test_streaming_scd2_resume_processes_only_new_files(spark, tmp_path):
    """Checkpointed resume: after draining two version files, a THIRD
    appears and a re-run over the same checkpoint folds only it in —
    the result equals a from-scratch run over all three."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    t = pd.Timestamp

    def write(i, rows):
        pd.DataFrame(rows, columns=["k", "ts", "p"]).to_parquet(
            src / f"f{i}.parquet", coerce_timestamps="us"
        )

    write(0, [(1, t("2024-01-01"), "a1"), (2, t("2024-01-01"), "b1")])
    write(1, [(1, t("2024-03-01"), "a2")])
    schema = "k bigint, ts timestamp, p string"
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def run(cp):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        ING.run_streaming_scd2(stream, table, cp, ["k"], "ts")

    run(ckpt)
    # new version arrives AFTER the first drain
    write(2, [(1, t("2024-02-01"), "a1b"), (2, t("2024-04-01"), "b2")])
    run(ckpt)  # same checkpoint: only f2 is new input

    def snap(path):
        return sorted(
            (r.k, r.p, str(r.valid_from)[:10],
             str(r.valid_to)[:10] if r.valid_to else None, r.is_current)
            for r in spark.read.parquet(path).collect()
        )

    got = snap(table)
    # from-scratch reference over all three files
    table2 = str(tmp_path / "table2")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ING.run_streaming_scd2(
        stream2, table2, str(tmp_path / "ckpt2"), ["k"], "ts"
    )
    assert got == snap(table2)
    assert got == [
        (1, "a1", "2024-01-01", "2024-02-01", False),
        (1, "a1b", "2024-02-01", "2024-03-01", False),
        (1, "a2", "2024-03-01", None, True),
        (2, "b1", "2024-01-01", "2024-04-01", False),
        (2, "b2", "2024-04-01", None, True),
    ]


def test_streaming_period_sums_batching_invariant_and_idempotent(
    spark, tmp_path
):
    """The merged period series equals the batch aggregate under
    multi-file micro-batching; a replayed epoch's re-appended
    partials don't change the merge."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(d, v) for d in range(5) for v in range(d + 1)],
        "d long, v long",
    )
    # several files -> several micro-batches
    df.filter(F.col("v") % 2 == 0).write.mode("append").parquet(src)
    df.filter(F.col("v") % 2 == 1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("d long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    ING.run_streaming_period_sums(
        stream, F.col("d"), F.col("v"), state, str(tmp_path / "ck")
    )
    got = {
        r.period: (r.n, r.v)
        for r in ING.read_period_sums(spark, state).collect()
    }
    want = {
        r.d: (r.n, r.v)
        for r in df.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v"))
        .collect()
    }
    assert got == want
    # replayed epoch: identical partials re-appended -> unchanged
    spark.read.parquet(state).write.mode("append").parquet(state)
    got2 = {
        r.period: (r.n, r.v)
        for r in ING.read_period_sums(spark, state).collect()
    }
    assert got2 == want
