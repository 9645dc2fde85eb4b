"""Event-time window queries over ``events`` (SURVEY.md §2.9 charter
extension — the reference streams purely by arrival order with no
timestamps; the engine adds event-time semantics).

These run the *batch* form of the windowed aggregations (identical
``F.window`` semantics to the streaming form — Structured Streaming
executes the same logical plan incrementally); the live streaming
pipelines with watermarks live in ``bigdata_kafka_2_spark/streaming/``
and are exercised by the streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import register

_FMT = "yyyy-MM-dd HH:mm:ss"


def _reconcile_stage(stage: str, expected: dict[str, str]) -> None:
    """Make the symlink stage dir match ``expected`` (link name →
    source file) EXACTLY. The dir persists in tempdir keyed by sf_dir,
    so a regenerated source (broken links), a file→directory layout
    change, or a different part-file count would otherwise leave stale
    links that duplicate or drop stream input — and ``os.path.exists``
    is False for a broken symlink, so the previous add-only staging
    raised FileExistsError after source regeneration (r7 advice). Any
    mismatch in the name set, a broken link, or a link pointing at a
    different target rebuilds the dir from scratch.
    """
    import os
    import shutil

    def _ok() -> bool:
        if not os.path.isdir(stage):
            return False
        if set(os.listdir(stage)) != set(expected):
            return False
        for name, target in expected.items():
            link = os.path.join(stage, name)
            if not os.path.islink(link) or not os.path.exists(link):
                return False
            if os.path.realpath(link) != os.path.realpath(target):
                return False
        return True

    if not _ok():
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        for name, target in expected.items():
            os.symlink(target, os.path.join(stage, name))


@register(
    "q60_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Tumbling 1-day event-time window aggregation "
    "(F.window == time_bucket; both align to the epoch in "
    "UTC). Streaming twin in streaming/windows.py.",
    tags=("streaming", "window", "date"),
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _staged_events_stream(
    spark: SparkSession, sf_dir: str, prefix: str, copies: tuple[str, ...]
) -> DataFrame:
    """Streaming source over the driver events table, staged via
    symlink(s) in a per-sf temp dir (the file streaming source requires
    a directory; multiple links simulate at-least-once redelivery).

    The ts column adapts to how the batch reader sees the file:
    generators have shipped it both as TIMESTAMP(NANOS) — which the
    batch path reads as a raw long (``nanosAsLong``) and truncates to
    µs — and as plain TIMESTAMP(MICROS). Mirror whichever the batch
    read produced so the streamed frame is column-identical to
    ``read_table``'s.
    """
    import hashlib
    import os
    import tempfile

    from pyspark.sql import types as T

    from bigdata_kafka_2_spark.io import read_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = read_table(spark, sf_dir, "events")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ns_ts = dict(raw.dtypes).get("ts") == "bigint"
    if ns_ts:
        stream_schema = T.StructType(
            [
                T.StructField("ts", T.LongType(), True) if f.name == "ts" else f
                for f in batch.schema.fields
            ]
        )
    else:
        stream_schema = raw.schema
    stage = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    # the source may be a single parquet FILE (driver test data) or a
    # parquet DIRECTORY (e.g. the scale probe's Spark-written replica);
    # the file streaming source does not traverse a symlinked
    # directory, so directory sources are linked file-by-file — the
    # probe's large-side streaming runs otherwise read an EMPTY stream
    # and report meaningless ratios (caught in the r7 probe record).
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        parts = sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        )
        sources = [(os.path.join(src, f), f"_{i}") for i, f in enumerate(parts)]
    else:
        sources = [(src, "")]
    expected = {
        f"events{tag}{part}.parquet": src_file
        for tag in copies
        for src_file, part in sources
    }
    _reconcile_stage(stage, expected)
    out = spark.readStream.schema(stream_schema).parquet(stage)
    if ns_ts:
        out = out.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    elif dict(out.dtypes).get("ts") != dict(batch.dtypes).get("ts"):
        out = out.withColumn("ts", F.col("ts").cast(dict(batch.dtypes)["ts"]))
    return out


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the driver events table (see
    :func:`_staged_events_stream`)."""
    return _staged_events_stream(spark, sf_dir, "q63_events", ("",))


def _drain(
    df: DataFrame,
    prefix: str,
    mode: str = "complete",
    source_bytes: int | None = None,
) -> str:
    """availableNow drain into a uniquely-named memory sink; returns
    the sink table name.

    With ``source_bytes`` the drain runs under the scale-adaptive
    streaming shuffle-partition count (state-store instances track
    input volume, not the static session setting — see
    ``streaming.ingest.stream_shuffle_partitions``); the session
    value is restored after the drain, and the streaming conf is
    read at query start so nothing else observes it.
    """
    import uuid
    from contextlib import nullcontext

    from bigdata_kafka_2_spark.streaming.ingest import scaled_stream_conf

    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ctx = (
        scaled_stream_conf(df.sparkSession, source_bytes)
        if source_bytes is not None
        else nullcontext()
    )
    with ctx:
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return sink


def _sf_bytes(sf_dir: str, *tables: str) -> int:
    """Bytes of the named sf tables (file or directory form)."""
    import os

    from bigdata_kafka_2_spark.streaming.ingest import source_size_bytes

    return source_size_bytes(
        *(os.path.join(sf_dir, f"{t}.parquet") for t in tables)
    )


@register(
    "q63_streaming_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description="The SAME tumbling-window aggregation as q60 but "
    "executed through Structured Streaming (readStream → "
    "watermark → window agg → availableNow drain into a "
    "memory sink): proves the streaming engine produces "
    "batch-identical, oracle-checkable results.",
    tags=("streaming", "window"),
)
def q63_streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.streaming.windows import windowed_counts

    agg = windowed_counts(_events_stream(spark, sf_dir), "1 day", watermark="1 hour")
    sink = _drain(agg, "q63_out", source_bytes=_sf_bytes(sf_dir, "events"))
    return spark.table(sink).select(
        F.date_format("window_start", _FMT).alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "q64_streaming_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    description="Sessionization executed through Structured Streaming "
    "(session_window + watermark, availableNow drain): gap-"
    "merged streaming sessions hash-match the batch lag-based "
    "sessionization oracle — the two formulations agree "
    "exactly.",
    tags=("streaming", "window"),
)
def q64_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.streaming.windows import session_aggregate

    agg = session_aggregate(
        _events_stream(spark, sf_dir), gap="30 minutes", watermark="1 hour"
    )
    sink = _drain(agg, "q64_out", source_bytes=_sf_bytes(sf_dir, "events"))
    return spark.table(sink).select(
        "user_id",
        F.date_format("session_start", _FMT).alias("session_start"),
        "n_events",
        "total_value",
    )


@register(
    "q61_sliding_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                      - k.o * INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events, (VALUES (0), (1)) k(o)
    GROUP BY 1
    """,
    description="Sliding window (1 h size, 30 min slide): every event "
    "falls in exactly 2 windows. Oracle enumerates the window "
    "offsets explicitly.",
    tags=("streaming", "window", "date"),
)
def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q62_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    description="Sessionization (30 min inactivity gap) via lag + "
    "cumulative session counter — the batch equivalent of "
    "streaming session_window; one shuffle on user_id.",
    tags=("streaming", "window"),
)
def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    # Microsecond-exact gap comparison so sub-second gaps round-trip
    # identically to the oracle's interval arithmetic.
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = e.withColumn(
        "session_id", F.sum(new_session).over(wrun).cast("long")
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _events_stream_duplicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream with EVERY event delivered twice (two symlinks
    to the same parquet file in the stage dir) — an at-least-once
    source simulation for the streaming-dedup query."""
    return _staged_events_stream(spark, sf_dir, "q65_events2x", ("_a", "_b"))


@register(
    "q65_streaming_dedup",
    oracle="""
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    description="Streaming exact deduplication "
    "(dropDuplicatesWithinWatermark over event_id, streaming/windows."
    "dedup_stream): the source delivers EVERY event twice (two staged "
    "copies — an at-least-once redelivery simulation), the stream "
    "dedups on the fly with watermark-bounded state, and the drained "
    "output's per-type counts must hash-match the plain batch counts "
    "over the ORIGINAL events table — exactly-once semantics "
    "reconstructed from an at-least-once source, checked end-to-end.",
    tags=("streaming", "dedup"),
)
def q65_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.streaming.windows import dedup_stream

    deduped = dedup_stream(
        _events_stream_duplicated(spark, sf_dir), ["event_id"], watermark="1 hour"
    )
    sink = _drain(deduped, "q65_out", mode="append", source_bytes=_sf_bytes(sf_dir, "events"))
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def _documents_stream(
    spark: SparkSession, sf_dir: str, prefix: str = "q84_docs"
) -> DataFrame:
    """Streaming source over the driver documents table (the
    :func:`_staged_events_stream` symlink-dir recipe, minus the
    events-only timestamp adaptation — documents carry no timestamp)."""
    import hashlib
    import os
    import tempfile

    batch = read_table(spark, sf_dir, "documents")
    stage = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    # file-vs-directory source handling: see _staged_events_stream
    src = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(src):
        sources = [
            (os.path.join(src, f), f"_{i}")
            for i, f in enumerate(
                sorted(x for x in os.listdir(src) if x.endswith(".parquet"))
            )
        ]
    else:
        sources = [(src, "")]
    _reconcile_stage(
        stage,
        {f"documents{part}.parquet": src_file for src_file, part in sources},
    )
    return spark.readStream.schema(batch.schema).parquet(stage)


def _q84_oracle(sf_dir: str) -> str:
    """q49's oracle VERBATIM (resolved lazily so the two queries can
    never drift): the streaming execution must be byte-identical to
    the batch operator."""
    from bigdata_kafka_2_spark.plans import REGISTRY

    return REGISTRY["q49_quality_filter"].oracle


@register(
    "q84_streaming_quality_filter",
    oracle=_q84_oracle,
    description="Curation-on-ingest: the SAME Gopher-style quality "
    "filter as graded q49 executed through Structured Streaming "
    "(readStream over the documents table → quality_filter_flags — "
    "row-local codegen expressions apply unchanged to a streaming "
    "DataFrame — → availableNow drain into a memory sink), "
    "hash-checked against q49's own oracle resolved verbatim: the "
    "streaming path must produce byte-identical per-document flags "
    "to the batch path. The streaming shape of the reference's "
    "process-then-serve lifecycle (README.md:87-93) applied to the "
    "charter's quality-filter stage; stateless, so at 100 TB it "
    "runs at source-rate with zero state store.",
    tags=("streaming", "text", "filter"),
)
def q84_streaming_quality_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import quality_filter_flags

    flagged = quality_filter_flags(_documents_stream(spark, sf_dir))
    sink = _drain(flagged, "q84_out", mode="append", source_bytes=_sf_bytes(sf_dir, "documents"))
    return spark.table(sink)


@register(
    "q101_stream_stream_join",
    oracle="""
    SELECT v.user_id, count(*) AS n_pairs
    FROM events v JOIN events c ON v.user_id = c.user_id
    WHERE v.event_type = 'view' AND c.event_type = 'click'
      AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '1 hour'
    GROUP BY 1
    """,
    description="STREAM-STREAM interval join through the gate: two "
    "streaming readers over the events source (views and clicks), "
    "watermarked on both sides, inner-joined on user with the "
    "event-time range constraint c.ts ∈ [v.ts, v.ts + 1 hour] — the "
    "one streaming shape the window/dedup family doesn't cover; the "
    "watermark + range bound is exactly what lets Spark expire "
    "buffered state, so at 100 TB/day the join state holds one "
    "watermark-horizon of events, not the stream. availableNow drain "
    "into a memory sink, then per-user pair counts hash-checked "
    "against the batch SQL join (streaming ≡ batch).",
    tags=("streaming", "join"),
)
def q101_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        _staged_events_stream(spark, sf_dir, "q101_v", ("",))
        .filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "2 hours")
    )
    clicks = (
        _staged_events_stream(spark, sf_dir, "q101_c", ("",))
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = views.join(
        clicks,
        F.expr(
            "v_user = c_user AND c_ts >= v_ts "
            "AND c_ts <= v_ts + interval 1 hour"
        ),
    )
    sink = _drain(joined, "q101_out", mode="append", source_bytes=_sf_bytes(sf_dir, "events"))
    return (
        spark.table(sink)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q128_stream_static_join",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           n_name,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    description="STREAM-STATIC enrichment join through the gate — the "
    "canonical streaming-ETL shape the q101 stream-stream join does "
    "not cover: the events stream joins the static customer→nation "
    "dimension (broadcast — at 100 TB/day of stream the dim is "
    "smaller by orders of magnitude, and the stream side never "
    "shuffles for the join), then aggregates per-nation daily "
    "revenue under a watermark. The join itself keeps NO state "
    "(static side re-read per micro-batch, so dim updates flow in "
    "without a restart); only the windowed aggregate holds "
    "watermark-bounded state. availableNow drain into a memory "
    "sink, hash-checked against the batch SQL join "
    "(streaming ≡ batch).",
    tags=("streaming", "join", "window"),
)
def q128_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.streaming.windows import (
        stream_static_enriched_windows,
    )

    dim = (
        read_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(read_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    agg = stream_static_enriched_windows(
        _staged_events_stream(spark, sf_dir, "q128_events", ("",)),
        dim,
        on="user_id",
    )
    sink = _drain(agg, "q128_out", source_bytes=_sf_bytes(sf_dir, "events"))
    return spark.table(sink).select(
        F.date_format("window_start", _FMT).alias("window_start"),
        "n_name",
        "n_events",
        "total_value",
    )


@register(
    "q132_streaming_upsert",
    oracle="""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_type AS last_event_type,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    description="Streaming CDC materialization through the gate "
    "(streaming/ingest.run_streaming_upsert): the events stream "
    "merge-upserts into a keyed parquet table via foreachBatch — per "
    "user, the (ts, event_id)-latest row wins across batches (the "
    "order columns are a total order per key, so ANY batching of the "
    "same input converges to the same table, and checkpoint-recovery "
    "re-application is a no-op). Batch-side reduction is a "
    "batch-keyed window (batch-sized state); the table swap is "
    "write-to-tmp + rename with entry-time crash recovery. The "
    "materialized table is read back and hash-checked against the "
    "batch per-user argmax.",
    tags=("streaming", "cdc"),
)
def q132_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.streaming.ingest import run_streaming_upsert

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q132_{tag}")
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    with scaled_stream_conf(spark, _sf_bytes(sf_dir, "events")):
        run_streaming_upsert(
            _staged_events_stream(spark, sf_dir, "q132_events", ("",)),
            table,
            ckpt,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
    )
    return spark.read.parquet(table).select(
        "user_id",
        F.date_format("ts", _FMT).alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@register(
    "q142_filelog_stream",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
    description="The custom Kafka-semantics Python DataSource through "
    "the gate (sources/filelog — Spark 4 DataSource V2 API): events "
    "staged as an append-only segmented JSON-lines log, streamed via "
    "the source's (segment, line) OFFSET protocol "
    "(initialOffset/latestOffset/partitions/commit — the consumer-"
    "group contract the env-blocked format('kafka') would provide), "
    "JSON-parsed and aggregated per event type, drained availableNow "
    "into a memory sink, hash-checked against the batch SQL "
    "aggregate. Driver-side work is offset dicts only; record bytes "
    "stay in executors both ways — the topic fixture is STAGED by "
    "distributed Spark text writes (to_json in executors, one "
    "rename per segment), and reads take one input split per "
    "segment delta.",
    tags=("streaming", "source"),
)
def q142_filelog_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from bigdata_kafka_2_spark.sources import register_filelog

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q142_topic_{tag}")
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    n_expected = e.count()
    done = os.path.join(base, "_STAGED")
    staged_n = None
    if os.path.exists(done):
        with open(done) as fh:
            staged_n = int(fh.read().strip() or 0)
    if staged_n != n_expected:
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        # DISTRIBUTED staging: each segment is produced by a Spark
        # text write (to_json in executors, one file via coalesce(1)
        # — the segment plays a Kafka partition, so single-writer is
        # the semantics, not a bottleneck) and renamed into the
        # topic layout; record bytes never pass through the driver,
        # so the staged topic can be arbitrarily large.
        stage = base + "__stage"
        for seg in range(4):
            shutil.rmtree(stage, ignore_errors=True)
            (
                e.filter(F.col("event_id") % 4 == seg)
                .select(
                    "event_id",
                    F.to_json(
                        F.struct("event_id", "event_type", "value")
                    ).alias("value"),
                )
                .coalesce(1)
                .sortWithinPartitions("event_id")
                .select("value")
                .write.mode("overwrite")
                .text(stage)
            )
            part = sorted(
                f for f in os.listdir(stage)
                if f.startswith("part-") and f.endswith(".txt")
            )
            os.rename(
                os.path.join(stage, part[0]),
                os.path.join(base, f"segment-{seg}.jsonl"),
            )
        shutil.rmtree(stage, ignore_errors=True)
        with open(done, "w") as fh:
            fh.write(str(n_expected))
    register_filelog(spark)
    stream = (
        spark.readStream.format("filelog").option("path", base).load()
    )
    parsed = stream.select(
        F.from_json(
            "value", "event_id long, event_type string, value double"
        ).alias("j")
    ).select("j.*")
    agg = parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    sink = _drain(agg, "q142_out", source_bytes=_sf_bytes(sf_dir, "events"))
    return spark.table(sink)


@register(
    "q190_streaming_psi",
    oracle="""
    WITH ref AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ),
    cur AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events
      WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL
    ),
    bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM ref),
    rc AS (
      SELECT least(9, greatest(0, CAST(CASE WHEN hi > lo
               THEN floor((v - lo) / ((hi - lo) / 10.0)) ELSE 0 END
             AS INT))) AS bucket, count(*) AS cr
      FROM ref, bounds GROUP BY 1
    ),
    cc AS (
      SELECT least(9, greatest(0, CAST(CASE WHEN hi > lo
               THEN floor((v - lo) / ((hi - lo) / 10.0)) ELSE 0 END
             AS INT))) AS bucket, count(*) AS ccnt
      FROM cur, bounds GROUP BY 1
    ),
    joined AS (
      SELECT b.bucket,
             COALESCE(rc.cr, 0) AS cr,
             COALESCE(cc.ccnt, 0) AS ccnt
      FROM (SELECT unnest(generate_series(0, 9)) AS bucket) b
        LEFT JOIN rc USING (bucket)
        LEFT JOIN cc USING (bucket)
    ),
    totals AS (SELECT sum(cr) AS nr, sum(ccnt) AS nc FROM joined)
    SELECT CAST(max(nr) AS BIGINT) AS n_ref,
           CAST(max(nc) AS BIGINT) AS n_cur,
           CAST(sum(CAST(round(
             ((cr + 1.0) / (nr + 10.0) - (ccnt + 1.0) / (nc + 10.0))
             * ln(((cr + 1.0) * (nc + 10.0))
                  / ((ccnt + 1.0) * (nr + 10.0))), 6)
             AS DECIMAL(28,6))) AS DOUBLE) AS psi
    FROM joined, totals
    """,
    description="Streaming drift monitor (streaming/ingest."
    "run_streaming_bucket_counts + profile.psi_from_counts): the "
    "current period's event values stream through foreachBatch, "
    "each micro-batch bucketized against the FROZEN reference-period "
    "bounds and appended as (epoch, bucket, n) mergeable partial "
    "counts — the monitor never rescans history, a PSI reading at "
    "any moment is one B-row aggregate over the state table; epoch "
    "ids make the merge idempotent under replay. Executed THROUGH "
    "Structured Streaming inside the gate (availableNow drain); the "
    "accumulated-state PSI hash-matches the batch transcription, "
    "streaming = batch.",
    tags=("streaming", "profile", "aggregate"),
)
def q190_streaming_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.io import read_table
    from bigdata_kafka_2_spark.operators.profile import psi_from_counts
    from bigdata_kafka_2_spark.streaming.ingest import (
        read_bucket_counts,
        run_streaming_bucket_counts,
    )

    split = F.lit("2024-01-16").cast("timestamp")
    e = read_table(spark, sf_dir, "events")
    ref = (
        e.filter(F.col("ts") < split)
        .select(F.col("value").cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    row = ref.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = float(row["lo"]), float(row["hi"])

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q190_{tag}")
    state = os.path.join(base, "counts")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    stream = _staged_events_stream(spark, sf_dir, "q190_events", ("",))
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    with scaled_stream_conf(spark, _sf_bytes(sf_dir, "events")):
        run_streaming_bucket_counts(
            stream.filter(F.col("ts") >= split),
            "value",
            lo,
            hi,
        10,
        state,
        ckpt,
    )

    b = F.least(
        F.lit(9),
        F.greatest(
            F.lit(0),
            F.when(
                F.lit(hi) > F.lit(lo),
                F.floor(
                    (F.col("v") - F.lit(lo))
                    / ((F.lit(hi) - F.lit(lo)) / F.lit(10.0))
                ),
            ).otherwise(F.lit(0)),
        ).cast("int"),
    )
    ref_counts = (
        ref.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return psi_from_counts(ref_counts, read_bucket_counts(spark, state), 10)


@register(
    "q199_streaming_heavy_hitters",
    oracle=f"""
    SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT unnest(string_split_regex(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '
      )) AS tok
      FROM documents
    ) WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 20
    """,
    description="Streaming heavy-hitter monitor (streaming/ingest."
    "run_streaming_token_counts + read_token_counts): the documents "
    "corpus streams through foreachBatch, each micro-batch's token "
    "counts appended as (epoch, tok, n) mergeable partials — the "
    "q190 state discipline with the token as the key, so the "
    "monitor never rescans history and its state grows with the "
    "VOCABULARY per epoch, not the corpus. A top-20 reading (n "
    "desc, tok asc — a total order) over the merged state is "
    "hash-checked against the batch token count; epoch ids keep "
    "the merge idempotent under crash replay. Executed THROUGH "
    "Structured Streaming inside the gate (availableNow drain).",
    tags=("streaming", "text", "aggregate"),
)
def q199_streaming_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.streaming.ingest import (
        read_token_counts,
        run_streaming_token_counts,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q199_{tag}")
    state = os.path.join(base, "counts")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    stream = _documents_stream(spark, sf_dir, prefix="q199_docs")
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    with scaled_stream_conf(spark, _sf_bytes(sf_dir, "documents")):
        run_streaming_token_counts(stream, "text", state, ckpt)
    counts = read_token_counts(spark, state)
    return counts.orderBy(
        F.col("n").desc(), F.col("tok").asc()
    ).limit(20)


@register(
    "q212_streaming_digest",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(CAST(coalesce(sum(CAST('0x' || substr(md5(
             concat_ws(chr(31),
               COALESCE(CAST(event_id AS VARCHAR), chr(0) || 'null'),
               COALESCE(CAST(user_id AS VARCHAR), chr(0) || 'null'),
               COALESCE(event_type, chr(0) || 'null')
             )), 1, 15) AS BIGINT)), 0) AS DECIMAL(38,0)) AS VARCHAR)
             AS digest
    FROM events
    """,
    description="Streaming content-digest verification (streaming/"
    "ingest.run_streaming_digest + read_streaming_digest): the "
    "events stream passes through foreachBatch, each micro-batch "
    "appending (epoch, n, digest) mergeable partials — the exact "
    "DECIMAL sum of the per-row portable hash shared with q211's "
    "batch dataset_digest — and the merged reading is hash-checked "
    "against the batch digest of the source table: streamed content "
    "== source content, a stronger exactly-once check than row "
    "counts (a drop and a duplicate cancel in a count; they cannot "
    "cancel in the digest). Epoch ids keep crash-replay idempotent. "
    "Executed THROUGH Structured Streaming inside the gate "
    "(availableNow drain).",
    tags=("streaming", "incremental", "aggregate"),
)
def q212_streaming_digest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.streaming.ingest import (
        read_streaming_digest,
        run_streaming_digest,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q212_{tag}")
    state = os.path.join(base, "digest")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    stream = _staged_events_stream(spark, sf_dir, "q212_events", ("",))
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    with scaled_stream_conf(spark, _sf_bytes(sf_dir, "events")):
        run_streaming_digest(
            stream, ["event_id", "user_id", "event_type"], state, ckpt
        )
    return read_streaming_digest(spark, state)


@register(
    "q213_streaming_scd2",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS bal,
           '2024-01-01' AS vf,
           CASE WHEN c_custkey < 50 THEN '2024-06-01' ELSE NULL END
             AS vt,
           (c_custkey >= 50) AS is_current
    FROM customer
    UNION ALL
    SELECT c_custkey, round(c_acctbal + 100.0, 2) AS bal,
           '2024-06-01' AS vf, CAST(NULL AS VARCHAR) AS vt,
           TRUE AS is_current
    FROM customer WHERE c_custkey < 50
    """,
    description="Streaming SCD type-2 materializer (streaming/"
    "ingest.run_streaming_scd2): a customer-version stream (initial "
    "balances, then an update wave for a key subset) applied through "
    "foreachBatch into a validity-interval history table — each "
    "key's versions become (valid_from, valid_to, is_current) rows "
    "with intervals DERIVED from the version set, so ANY micro-"
    "batching of the same stream (maxFilesPerTrigger=1 here forces "
    "several) converges to the same table and crash-replay is a "
    "no-op; per-batch work is one batch dedup window plus one "
    "left-anti/left-semi keyed join pair against the store — "
    "untouched keys pass through, never rewritten per key. The "
    "table this maintains is what q148's point-in-time join reads. "
    "Hash-checked against the batch SCD2 history stated directly by "
    "the oracle (q93's machinery). Executed THROUGH Structured "
    "Streaming inside the gate (availableNow drain).",
    tags=("streaming", "cdc"),
)
def q213_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.streaming.ingest import (
        run_streaming_scd2,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q213_{tag}")
    stage = os.path.join(base, "stream")
    table = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    c = read_table(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    v2 = c.filter(F.col("c_custkey") < 50).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("bal"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
    )
    # distributed staging: both version waves written by Spark into
    # one stream directory; file->micro-batch assignment is arbitrary
    # and the materializer's result is invariant to it by design
    v1.write.mode("append").parquet(stage)
    v2.write.mode("append").parquet(stage)
    stream = (
        spark.readStream.schema(v1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    from bigdata_kafka_2_spark.streaming.ingest import source_size_bytes

    with scaled_stream_conf(spark, source_size_bytes(stage)):
        run_streaming_scd2(stream, table, ckpt, ["c_custkey"], "ts")
    return spark.read.parquet(table).select(
        "c_custkey",
        "bal",
        F.date_format("valid_from", "yyyy-MM-dd").alias("vf"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("vt"),
        "is_current",
    )


@register(
    "q220_streaming_erasure",
    oracle="""
    WITH subj AS (
      SELECT DISTINCT c_custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey < 100
    ),
    kept AS (
      SELECT * FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM subj)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM subj)
             AS n_erased_total,
           CAST(count(*) AS BIGINT) AS n_remaining,
           CAST(CAST(coalesce(sum(CAST('0x' || substr(md5(
             concat_ws(chr(31),
               COALESCE(CAST(c_custkey AS VARCHAR), chr(0) || 'null'),
               COALESCE(c_name, chr(0) || 'null'),
               COALESCE(CAST(c_nationkey AS VARCHAR),
                        chr(0) || 'null'),
               COALESCE(c_mktsegment, chr(0) || 'null')
             )), 1, 15) AS BIGINT)), 0) AS DECIMAL(38,0)) AS VARCHAR)
             AS released_digest
    FROM kept
    """,
    description="Streaming right-to-be-forgotten (streaming/ingest."
    "run_streaming_erasure + read_erasure_audit): deletion requests "
    "arrive as a STREAM of subject ids (the under-100 AUTOMOBILE "
    "customers, one micro-batch per staged file) and each batch "
    "purges the stored customer table — broadcast ids onto ONE "
    "left-anti join, q132's atomic rename swap — appending an audit "
    "partial (epoch, n_erased, n_remaining, released_digest): "
    "q216's proof artifact made CONTINUOUS, so a compliance check "
    "reads the latest row instead of rescanning history. Replay-"
    "idempotent (re-erasing removes nothing and reproduces the same "
    "digest; epoch ids dedup the trail) and batching-invariant (set "
    "difference commutes with union of removals). Hash-checked: the "
    "final audit row must equal the batch digest of customer minus "
    "the full request set. Executed THROUGH Structured Streaming "
    "inside the gate (availableNow drain).",
    tags=("streaming", "privacy", "incremental"),
)
def q220_streaming_erasure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.streaming.ingest import (
        read_erasure_audit,
        run_streaming_erasure,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q220_{tag}")
    stage = os.path.join(base, "requests")
    table = os.path.join(base, "table")
    audit = os.path.join(base, "audit")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    c = read_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    c.select(*cols).write.parquet(table)
    subj = c.filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_custkey") < 100)
    ).select("c_custkey")
    # stage the request stream as several files -> several batches
    subj.filter(F.col("c_custkey") % 2 == 0).write.mode("append").parquet(stage)
    subj.filter(F.col("c_custkey") % 2 == 1).write.mode("append").parquet(stage)
    stream = (
        spark.readStream.schema("c_custkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    from bigdata_kafka_2_spark.streaming.ingest import source_size_bytes

    with scaled_stream_conf(spark, source_size_bytes(stage)):
        run_streaming_erasure(stream, table, ckpt, "c_custkey", cols, audit)
    return read_erasure_audit(spark, audit)


@register(
    "q231_streaming_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS c
      FROM events GROUP BY 1
    ),
    pre AS (
      SELECT d, c,
             sum(c) OVER (ORDER BY d) AS p,
             row_number() OVER (ORDER BY d) AS i
      FROM daily
    ),
    tot AS (SELECT count(*) AS n, sum(c) AS t FROM daily)
    SELECT CAST(n AS BIGINT) AS n_periods,
           strftime(d, '%Y-%m-%d') AS day,
           round(CAST(abs(n * p - i * t) AS DOUBLE) / (n * 1.0), 4)
             AS max_cusum
    FROM pre, tot
    ORDER BY abs(n * p - i * t) DESC, d ASC LIMIT 1
    """,
    description="Streaming CUSUM changepoint monitor (streaming/"
    "ingest.run_streaming_period_sums + timeseries."
    "cusum_changepoint): the event stream folds into (epoch, day, "
    "count) mergeable partials through foreachBatch — day-keyed "
    "counts merge by summation, so ANY micro-batching converges to "
    "the same daily series (CUSUM state is not order-mergeable, but "
    "the PERIOD-KEYED series underneath it is: that is the cut "
    "point between streaming state and batch analytics) — and the "
    "changepoint reading runs q204's all-integer two-prefix-sum "
    "plan over the merged series, hash-checked against the batch "
    "transcription: streaming = batch. Epoch ids keep the merge "
    "idempotent under crash replay; state grows with the DAY RANGE "
    "per epoch, never event volume. Executed THROUGH Structured "
    "Streaming inside the gate (availableNow drain).",
    tags=("streaming", "timeseries", "profile"),
)
def q231_streaming_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.operators.timeseries import (
        cusum_changepoint,
    )
    from bigdata_kafka_2_spark.streaming.ingest import (
        read_period_sums,
        run_streaming_period_sums,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q231_{tag}")
    state = os.path.join(base, "sums")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    stream = _staged_events_stream(spark, sf_dir, "q231_events", ("",))
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
    )

    with scaled_stream_conf(spark, _sf_bytes(sf_dir, "events")):
        run_streaming_period_sums(
            stream, F.to_date("ts"), F.lit(1), state, ckpt
        )
    daily = read_period_sums(spark, state).select(
        F.col("period").alias("d"), F.col("n").alias("c")
    )
    out = cusum_changepoint(daily, "d", "c", unit_scale=1)
    return out.select(
        "n_periods",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "max_cusum",
    )


@register(
    "q232_streaming_reservoir",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                          || ':42'), 1, 15)
                       AS BIGINT) + 0.5) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS ekey
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM keyed ORDER BY ekey, doc_id LIMIT 100
    """,
    description="Streaming weighted reservoir (streaming/ingest."
    "run_streaming_reservoir + read_reservoir): q230's Efraimidis-"
    "Spirakis sample maintained AS A STREAM — each micro-batch keeps "
    "its k smallest deterministic exponential keys, and because "
    "every global winner is inside its own batch's top-k, a top-k "
    "over the O(k·epochs) partials EQUALS the batch sample over all "
    "data: any micro-batching converges, replayed epochs re-append "
    "byte-identical rows a distinct() removes, state is O(k) per "
    "epoch. Hash-checked against the batch oracle VERBATIM "
    "(streaming = batch — the rolling-ingest way to keep an always-"
    "current weighted corpus sample without rescanning history). "
    "Executed THROUGH Structured Streaming inside the gate "
    "(availableNow drain).",
    tags=("streaming", "sampling"),
)
def q232_streaming_reservoir(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.streaming.ingest import (
        read_reservoir,
        run_streaming_reservoir,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q232_{tag}")
    state = os.path.join(base, "sample")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    stream = _documents_stream(spark, sf_dir).filter(
        F.col("n_chars") > 0
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":42"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    ekey = -F.log(u) / F.col("n_chars").cast("double")
    run_streaming_reservoir(
        stream, ekey, 100, ["doc_id", "n_chars"], state, ckpt
    )
    return read_reservoir(spark, state, 100, ["doc_id", "n_chars"]).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )


def _q250_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.plans.relational_queries2 import (
        _q242_matches_cte,
    )
    from bigdata_kafka_2_spark.operators.preference import bt_oracle_sql

    return bt_oracle_sql(_q242_matches_cte(), iterations=3)


@register(
    "q250_streaming_preference_ingest",
    oracle=_q250_oracle,
    description="Streaming pairwise-preference ingest (streaming/"
    "ingest.run_streaming_wins): the within-customer priority duels "
    "of q242 arrive as a multi-file comparison STREAM "
    "(maxFilesPerTrigger=1 forces several micro-batches); each batch "
    "reduces to |players|^2-bounded win-count partials appended "
    "through foreachBatch, the read-side merge sums them, and the "
    "same 3-round Bradley-Terry MM fit runs on the merged table. "
    "Mergeability is exact BY CONSTRUCTION - win counts are a "
    "commutative monoid over atomic decided comparisons, so ANY "
    "micro-batching converges to the byte-identical table (the "
    "family's cut point, next to q231's period-sum partials and "
    "q232's top-k partials); replayed epochs re-append deterministic "
    "partial rows that the merge's distinct() removes. Hash-checked "
    "against the BATCH-stated q242 oracle: streamed-then-fitted == "
    "batch-fitted, the q212/q213 streamed-equals-batch discipline.",
    tags=("streaming", "preference", "iterative"),
)
def q250_streaming_preference_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.operators.preference import bradley_terry
    from bigdata_kafka_2_spark.streaming.ingest import (
        read_wins,
        run_streaming_wins,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q250_{tag}")
    stage = os.path.join(base, "stream")
    state = os.path.join(base, "wins")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    o = read_table(spark, sf_dir, "orders")
    left = o.select(
        F.col("o_custkey").alias("__g"),
        F.col("o_orderpriority").alias("a"),
        F.col("o_totalprice").alias("__pa"),
    )
    right = o.select(
        F.col("o_custkey").alias("__g"),
        F.col("o_orderpriority").alias("b"),
        F.col("o_totalprice").alias("__pb"),
    )
    comparisons = (
        left.join(right, on="__g")
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("__pa") != F.col("__pb"))  # ties carry no signal
        .select(
            "a",
            "b",
            F.when(F.col("__pa") < F.col("__pb"), 1)
            .otherwise(0)
            .alias("a_won"),
        )
    )
    # distributed staging into several files so availableNow +
    # maxFilesPerTrigger=1 forces a genuinely multi-batch drain
    comparisons.repartition(4).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(comparisons.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
        source_size_bytes,
    )

    with scaled_stream_conf(spark, source_size_bytes(stage)):
        run_streaming_wins(stream, state, ckpt)
    matches = read_wins(spark, state)
    return bradley_terry(matches, iterations=3).select(
        F.col("player"), F.col("strength")
    )


def _q273_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.plans.relational_queries2 import (
        _q265_oracle,
    )

    # streamed-equals-batch: the merged count partials feed the SAME
    # gate the batch q265 states, so the oracle IS q265's
    return _q265_oracle(sf_dir)


@register(
    "q273_streaming_srm",
    oracle=_q273_oracle,
    description="Streaming sample-ratio-mismatch monitor (streaming/"
    "ingest.run_streaming_counts + operators/profile.srm_from_counts): "
    "the 4-way traffic split of q265 arrives as a multi-file event "
    "STREAM (maxFilesPerTrigger=1 forces several micro-batches); each "
    "batch reduces to |arms|-bounded count partials appended with the "
    "epoch id through foreachBatch, the read-side merge dedups "
    "replayed epochs and sums the commutative-monoid counts, and the "
    "SRM gate (odd-df chi-square survival) runs on the merged "
    "|arms|-row table - the live assignment-health monitor an "
    "experimentation platform actually runs, never rescanning the "
    "event stream. Hash-checked against the BATCH-stated q265 oracle: "
    "streamed-then-gated == batch-gated (the q250/q212/q213 "
    "streamed-equals-batch discipline).",
    tags=("streaming", "profile"),
)
def q273_streaming_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from bigdata_kafka_2_spark.operators.profile import srm_from_counts
    from bigdata_kafka_2_spark.streaming.ingest import (
        read_counts,
        run_streaming_counts,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"q273_{tag}")
    stage = os.path.join(base, "stream")
    state = os.path.join(base, "counts")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    o = read_table(spark, sf_dir, "orders")
    events = o.select(
        (F.col("o_custkey") % 4).cast("string").alias("arm")
    )
    events.repartition(4).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    from bigdata_kafka_2_spark.streaming.ingest import (
        scaled_stream_conf,
        source_size_bytes,
    )

    with scaled_stream_conf(spark, source_size_bytes(stage)):
        run_streaming_counts(stream, "arm", state, ckpt)
    per = read_counts(spark, state, "arm")
    return srm_from_counts(per)
