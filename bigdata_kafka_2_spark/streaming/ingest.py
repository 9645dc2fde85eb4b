"""Streaming ingest pipeline (SURVEY.md §3.1 boundaries 1-3, §2.9).

Reference flow: Kafka JSON rows → coerce to fixed schema → micro-batch
files. Engine flow: any streaming source of JSON strings (Kafka
``value`` column, or a JSON-lines file source for tests — same codec,
F4) → ``from_json`` with the canonical schema → ``conform_schema`` →
checkpointed parquet sink.

Semantics mapping:

- ``auto_offset_reset='earliest'`` → ``startingOffsets=earliest``
  (io.read_kafka_stream).
- 90 s idle-timeout drain (``batch_writer_consumer.py:32``) →
  ``trigger(availableNow=True)``: process everything available, then
  stop.
- count-based 2000-row batches (``batch_writer_consumer.py:8``) →
  micro-batches are trigger-scoped; exact row counts per file are an
  implementation detail the engine does not reproduce (SURVEY §7
  risk (d)) — totals and exactly-once are the asserted contract.
- consumer-group offset tracking → checkpoint dir (exactly-once into
  the file sink; the reference was at-least-once).
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_kafka_2_spark.schema import conform_schema


def stream_shuffle_partitions(
    spark: SparkSession,
    source_bytes: int,
    floor: int = 4,
    target_bytes: int = 64 << 20,
) -> int:
    """Scale-adaptive shuffle-partition count for a STREAMING query:
    ``ceil(source_bytes / 64 MB)``, floored at 4 and capped at
    ``max(session shuffle partitions, 2048)``.

    Stateful streaming operators instantiate one state store per
    shuffle partition per operator per micro-batch — open, commit,
    maintenance each — and AQE does not coalesce streaming shuffles,
    so a static partition count pays that overhead regardless of
    volume (guide §2.2's block-count tax in state-store form;
    measured on this host: the sf0.1 stream-stream interval join is
    ~10 s at 32 partitions and ~3.9 s at 4, identical results). The
    count must therefore track the data, not the core count: small
    drains collapse to a handful of stores, a 100 TB/day stream fans
    out to the session's configured width and beyond. The value is
    pinned into the streaming checkpoint by Spark at first start, so
    restarts are unaffected by later drift of the inputs.

    ``$SPARK_GRAFT_STREAM_SHUFFLE`` overrides (operational escape
    hatch; also keeps the driver's lower-core bench runs comparable
    — the default derivation depends only on input size, never on
    the core count).
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return max(1, int(env))
    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = max(floor, math.ceil(source_bytes / target_bytes))
    return min(n, max(session, 2048))


@contextmanager
def scaled_stream_conf(spark: SparkSession, source_bytes: int):
    """Set ``spark.sql.shuffle.partitions`` to the scale-adaptive
    streaming value around a stream's start→drain window, restoring
    the session value after. Streaming plans read the conf at query
    START, so wrapping ``start()``/``awaitTermination()`` is
    sufficient and nothing else in the session observes the change.
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(stream_shuffle_partitions(spark, source_bytes)))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def source_size_bytes(*paths: str) -> int:
    """Total bytes under the given files/directories (one os.stat
    walk; no Spark job) — the input-size measure the adaptive
    streaming partition count derives from."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def parse_json_stream(
    raw: DataFrame, schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """F4 decode: JSON string column → typed columns → conform.

    Works identically on a Kafka source (``value`` cast to string) and
    a text-file source (for tests). Unparseable JSON yields an
    all-null struct, which conformance turns into default-filled rows —
    the producer's bad-line policy (``producer.py:96-99``), but
    retained-with-defaults instead of dropped (count them by filtering
    on the pre-conform struct if needed).
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("r")
    ).select("r.*")
    return conform_schema(parsed, schema)


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """File-source twin of the Kafka consumer: each line = one JSON
    message (exactly the producer's wire format, ``producer.py:28``)."""
    raw = spark.readStream.format("text").load(path)
    return parse_json_stream(raw, schema, value_col="value")


def run_ingest_counted(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    order_col: str,
    batch_size: int = 2000,
) -> None:
    """Count-based micro-batch files — exact S5 parity
    (``batch_writer_consumer.py:8,63-69``: flush every ``batch_size``
    rows into numbered CSV files, final partial file included).

    Structured Streaming triggers are time/availability-scoped, so the
    row-count contract is enforced inside ``foreachBatch``: rows are
    ranked by ``order_col`` (the reference used arrival order, which is
    not reproducible — a total order is) and written partitioned by
    ``chunk = rank // batch_size``. Each chunk lands as
    ``chunk=N/part-*.csv`` with ≤ ``batch_size`` rows. Checkpointing
    still gives exactly-once per epoch.
    """
    from pyspark.sql import Window

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        w = Window.orderBy(order_col)
        chunked = batch_df.withColumn(
            "chunk",
            ((F.row_number().over(w) - 1) / batch_size).cast("int"),
        )
        (
            chunked.write.mode("append")
            .partitionBy("chunk")
            .option("header", "true")
            .csv(f"{out_dir}/epoch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_ingest(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
) -> None:
    """Drain-and-stop ingest: write all available input to ``out_dir``
    exactly-once, then return (the ``consumer_timeout_ms`` lifecycle).

    Restart-safe: re-running with the same checkpoint dir skips
    already-committed input — asserted by the exactly-once test.
    """
    q = (
        stream.writeStream.format(fmt)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_upsert(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_cols: list[str],
) -> None:
    """Streaming CDC materialization: ``foreachBatch`` merge-upsert of
    a change stream into a keyed parquet table — per key, the row with
    the highest ``order_cols`` tuple wins, across batches and across
    restarts.

    Each micro-batch (a) reduces ITSELF to one winner per key (a
    batch-keyed window — batch-sized state, never table-sized), then
    (b) merges with the stored table by the same precedence and swaps
    the result in atomically (write-to-tmp + rename, with entry-time
    recovery from a crash between the renames — the
    ``io.compact_parquet`` discipline). The merge compares the
    ORDER COLUMNS, not arrival order, so any batching of the same
    input converges to the same table; re-applying a batch after a
    checkpoint-recovery restart is a no-op (idempotent upsert — the
    exactly-once contract without sink-side transaction support,
    asserted by the restart test).

    At scale the merge is a key-partitioned shuffle of (stored ∪
    batch-winners); pair with a bucketed store layout to make it
    exchange-free on the stored side.
    """
    import os
    import shutil

    from pyspark.sql import Window

    tmp = table_path.rstrip("/") + "__upsert_tmp"
    old = table_path.rstrip("/") + "__upsert_old"

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        # entry-time recovery from a crash between the two renames
        if os.path.exists(old) and not os.path.exists(table_path):
            os.rename(old, table_path)
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        best = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.exists(table_path):
            current = spark.read.parquet(table_path)
            merged = (
                current.unionByName(best)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            merged = best
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(table_path):
            os.rename(table_path, old)
        os.rename(tmp, table_path)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_with_metrics(
    df: DataFrame,
    sink_name: str,
    mode: str = "complete",
) -> tuple[str, list[dict]]:
    """availableNow drain into a memory sink, returning
    ``(sink_name, per-batch progress records)`` — the operational
    observability a production stream needs (rows per batch, batch
    duration, state-store rows) surfaced from Spark's own
    ``recentProgress`` rather than a side channel. Each record keeps
    ``{batchId, numInputRows, durationMs, stateRows}``; totals are
    asserted against the drained input in tests, so the metrics are
    verified numbers, not log strings.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = []
    for p in q.recentProgress:
        state = p.get("stateOperators") or []
        out.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows", 0),
                "durationMs": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "stateRows": sum(
                    s.get("numRowsTotal", 0) for s in state
                ),
            }
        )
    return sink_name, out


def run_streaming_bucket_counts(
    stream_df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming half of a drift monitor: bucketize each micro-batch
    of ``value_col`` against FIXED reference bounds (the bucket
    expression is
    ``profile.psi_drift``'s, with the reference bounds embedded as
    literals) and append the batch's ``(epoch_id, bucket, n)``
    partial counts — the mergeable state (counts merge by summation,
    the q150 contract), so the monitor never rescans history and a
    PSI reading at any moment is one B-row aggregate over this table
    + ``profile.psi_from_counts``. Rows carry the epoch id, so a
    replayed epoch after a crash-restart overwrites to the SAME
    logical content and the reader's per-epoch max-dedup keeps the
    merge idempotent.

    NULL values are excluded before bucketing (mirroring
    :func:`~bigdata_kafka_2_spark.operators.profile.psi_drift` —
    ``greatest(0, floor(NULL))`` would otherwise count missing data
    into bucket 0 and fake drift).
    """
    b = int(n_buckets)
    col = F.col(value_col).cast("double")
    bucket = F.least(
        F.lit(b - 1),
        F.greatest(
            F.lit(0),
            (
                F.floor(
                    (col - F.lit(float(lo)))
                    / ((F.lit(float(hi)) - F.lit(float(lo))) / F.lit(float(b)))
                )
                if hi > lo
                else F.lit(0)
            ),
        ).cast("int"),
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.filter(col.isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_bucket_counts(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the accumulated partial counts: per-epoch max-dedup
    (idempotent under epoch replay) then one bucket-keyed sum."""
    return (
        spark.read.parquet(out_path)
        .groupBy("epoch_id", "bucket")
        .agg(F.max("n").alias("n"))
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )


def run_streaming_token_counts(
    stream_df: DataFrame,
    text_col: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming half of a heavy-hitter monitor: per micro-batch,
    explode ``text_col`` into normalized whitespace tokens and append
    the batch's ``(epoch_id, tok, n)`` partial counts — the same
    mergeable-state discipline as :func:`run_streaming_bucket_counts`
    (counts merge by summation; epoch ids keep crash-replay
    idempotent), with the token as the state key. A top-k reading at
    any moment is one token-keyed aggregate over this table
    (:func:`read_token_counts`) — the monitor never rescans history,
    and the state table grows with the VOCABULARY per epoch, not the
    corpus.
    """
    from bigdata_kafka_2_spark.operators.text import normalize_text

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(
                F.explode(
                    F.split(normalize_text(text_col), " ")
                ).alias("tok")
            )
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_token_counts(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the accumulated token partials: per-(epoch, tok) max
    dedup (idempotent under epoch replay), then one token-keyed
    sum — ``(tok, n)``."""
    return (
        spark.read.parquet(out_path)
        .groupBy("epoch_id", "tok")
        .agg(F.max("n").alias("n"))
        .groupBy("tok")
        .agg(F.sum("n").alias("n"))
    )


def run_streaming_digest(
    stream_df: DataFrame,
    cols: list[str],
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming content-digest monitor: per micro-batch, append
    ``(epoch_id, n, digest)`` — the batch's row count and the exact
    DECIMAL(38,0) sum of the per-row portable hash
    (:func:`~bigdata_kafka_2_spark.operators.incremental.
    row_digest_column`, shared with the batch
    ``dataset_digest``). Digest partials MERGE by summation (the
    q190/q199 mergeable-state discipline with content identity as
    the state), so an ingest pipeline can verify
    streamed-content == source-content at any moment with one
    aggregate over this table — a stronger exactly-once check than
    row counts (a dropped row and a duplicated row cancel in a
    count; they cannot cancel in the digest). Epoch ids keep the
    merge idempotent under crash replay.
    """
    from bigdata_kafka_2_spark.operators.incremental import (
        row_digest_column,
    )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        h = row_digest_column(batch_df, cols)
        (
            batch_df.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.coalesce(
                    F.sum(h), F.lit(0).cast("decimal(38,0)")
                ).alias("digest"),
            )
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_streaming_digest(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the accumulated digest partials: per-epoch max dedup
    (a replayed epoch re-appends identical content), then one scalar
    sum — ``(n_rows, digest)`` with the digest rendered as a string,
    matching ``dataset_digest``'s output shape."""
    per_epoch = (
        spark.read.parquet(out_path)
        .groupBy("epoch_id")
        .agg(F.max("n").alias("n"), F.max("digest").alias("digest"))
    )
    return per_epoch.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum("digest"), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("digest"),
    )


def run_streaming_scd2(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> None:
    """Streaming SCD type-2 materializer: ``foreachBatch``
    apply-changes of a version stream into a validity-interval
    history table — the q132 upsert discipline extended from
    last-write-wins to INTERVAL CLOSING, so what
    :func:`~bigdata_kafka_2_spark.operators.cdc.point_in_time_join`
    reads is maintained by the stream that feeds it.

    Batching-determinism is BY CONSTRUCTION, not by ordering
    assumptions: the history is always the validity intervals DERIVED
    from the SET of versions seen so far (a version = key columns +
    business columns + ``ts_col``; ``valid_to`` = the key's next
    version timestamp, open for the last). Any partitioning of the
    same input into micro-batches — including out-of-ORDER delivery
    of an earlier version in a later batch, which a close-at-append
    scheme like batch ``scd2_apply`` cannot repair — converges to the
    same table, and re-applying a batch after checkpoint-recovery
    restart is a no-op (duplicate (key, ts) versions collapse
    deterministically). That is the exactly-once contract without
    sink-side transaction support.

    Per-batch plan (the 100 TB shape): one batch-sized dedup window,
    ONE left-anti + one left-semi keyed join against the stored
    history (untouched keys pass through untouched — per-key interval
    recomputation happens only for keys present in the batch, so
    per-batch work is O(batch + touched-key history), never
    O(table)), then the atomic write-tmp/rename swap shared with
    :func:`run_streaming_upsert`.
    """
    import os
    import shutil

    from pyspark.sql import Window

    keys = list(key_cols)
    tmp = table_path.rstrip("/") + "__scd2_tmp"
    old = table_path.rstrip("/") + "__scd2_old"

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        if os.path.exists(old) and not os.path.exists(table_path):
            os.rename(old, table_path)
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        payload = [
            c for c in batch_df.columns if c not in keys + [ts_col]
        ]
        # collapse duplicate (key, ts) versions deterministically
        # (redelivery / replay): max struct over the payload columns
        dedup_w = Window.partitionBy(*keys, ts_col).orderBy(
            *[F.col(c).desc_nulls_last() for c in payload],
        )
        batch_versions = (
            batch_df.withColumn("__rn", F.row_number().over(dedup_w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        affected = batch_versions.select(*keys).distinct()
        if os.path.exists(table_path):
            history = spark.read.parquet(table_path)
            untouched = history.join(affected, on=keys, how="left_anti")
            stored_versions = (
                history.join(affected, on=keys, how="left_semi")
                .withColumnRenamed(valid_from, ts_col)
                .select(*keys, ts_col, *payload)
            )
            versions = stored_versions.unionByName(
                batch_versions.select(*keys, ts_col, *payload)
            )
            # replayed batch rows collapse against their stored copies
            versions = (
                versions.withColumn(
                    "__rn", F.row_number().over(dedup_w)
                )
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            untouched = None
            versions = batch_versions.select(*keys, ts_col, *payload)
        iv_w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
        recomputed = (
            versions.withColumn(valid_to, F.lead(ts_col).over(iv_w))
            .withColumnRenamed(ts_col, valid_from)
            .withColumn(current_flag, F.col(valid_to).isNull())
            .select(
                *keys, *payload, valid_from, valid_to, current_flag
            )
        )
        merged = (
            recomputed
            if untouched is None
            else untouched.unionByName(recomputed)
        )
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(table_path):
            os.rename(table_path, old)
        os.rename(tmp, table_path)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_erasure(
    requests: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str,
    digest_cols: list[str],
    audit_path: str,
) -> None:
    """Streaming right-to-be-forgotten: deletion requests arrive as a
    STREAM of subject ids and each micro-batch purges them from the
    stored table, appending an audit partial ``(epoch_id, n_erased,
    n_remaining, released_digest)`` — the
    :func:`~bigdata_kafka_2_spark.operators.incremental.erasure_audit`
    proof discipline made continuous: at any moment the LATEST audit
    row is the exact content digest the live table must hash to, so a
    compliance check never rescans history to know the store is
    clean. (Deletion requests in production ARE a stream — arrival-
    batched, not a quarterly job.)

    Idempotent by construction: re-applying a batch after checkpoint-
    recovery erases nothing new (the ids are already gone) and
    appends an audit row with the SAME digest; epoch ids keep the
    audit trail replay-dedupable (the q212 discipline). Any batching
    of the same request set converges to the same table and the same
    final digest — set difference commutes with union of the removal
    sets.

    Per-batch plan: the batch's ids deduplicate (batch-sized),
    BROADCAST onto one left-anti join (the purge) and the audit's
    count/digest reduce in one map-side aggregate over the kept rows;
    the table swap is the q132 atomic rename. Table rows shuffle
    nowhere.
    """
    import os
    import shutil

    from bigdata_kafka_2_spark.operators.incremental import (
        row_digest_column,
    )

    tmp = table_path.rstrip("/") + "__erase_tmp"
    old = table_path.rstrip("/") + "__erase_old"

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        if os.path.exists(old) and not os.path.exists(table_path):
            os.rename(old, table_path)
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        ids = F.broadcast(
            batch_df.select(F.col(batch_df.columns[0]).alias(key_col))
            .distinct()
        )
        current = spark.read.parquet(table_path)
        n_before = current.count()
        kept = current.join(ids, on=key_col, how="left_anti")
        kept.write.mode("overwrite").parquet(tmp)
        os.rename(table_path, old)
        os.rename(tmp, table_path)
        shutil.rmtree(old, ignore_errors=True)
        released = spark.read.parquet(table_path)
        h = row_digest_column(released, digest_cols)
        (
            released.agg(
                F.count(F.lit(1)).cast("long").alias("n_remaining"),
                F.coalesce(
                    F.sum(h), F.lit(0).cast("decimal(38,0)")
                )
                .cast("decimal(38,0)")
                .cast("string")
                .alias("released_digest"),
            )
            .select(
                F.lit(int(epoch_id)).alias("epoch_id"),
                (F.lit(n_before) - F.col("n_remaining"))
                .cast("long")
                .alias("n_erased"),
                "n_remaining",
                "released_digest",
            )
            .write.mode("append")
            .parquet(audit_path)
        )

    q = (
        requests.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_erasure_audit(spark: SparkSession, audit_path: str) -> DataFrame:
    """The audit trail's verdict: total rows erased across all epochs
    plus the LIVE table's required content hash — one row
    ``(n_erased_total, n_remaining, released_digest)`` taken from the
    latest epoch (per-epoch max dedups crash replays, which append
    identical content under the same epoch id)."""
    per_epoch = (
        spark.read.parquet(audit_path)
        .groupBy("epoch_id")
        .agg(
            F.max("n_erased").alias("n_erased"),
            F.max("n_remaining").alias("n_remaining"),
            F.max("released_digest").alias("released_digest"),
        )
    )
    last = per_epoch.orderBy(F.col("epoch_id").desc()).limit(1)
    totals = per_epoch.agg(
        F.sum("n_erased").cast("long").alias("n_erased_total")
    )
    return totals.crossJoin(F.broadcast(last)).select(
        "n_erased_total",
        "n_remaining",
        "released_digest",
    )


def run_streaming_period_sums(
    stream_df: DataFrame,
    period_expr,
    value_expr,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming half of a changepoint/trend monitor: per micro-batch,
    aggregate ``(period, n, v)`` partials — ``period_expr`` the
    integer/date period key, ``value_expr`` an exact-integer-unit
    measure — and append them with the epoch id. Period-keyed counts
    and sums merge by summation (the q150/q190 mergeable-state
    contract), so ANY batching of the input converges to the same
    merged series, the monitor never rescans history, and a CUSUM /
    Theil-Sen / ACF reading at any moment is one bounded aggregate
    over this table. Epoch ids make the merge idempotent under
    crash replay (the reader max-dedups per (epoch, period)).
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(
                period_expr.alias("period"), value_expr.alias("__v")
            )
            .groupBy("period")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("__v").cast("long")).alias("v"),
            )
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_period_sums(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the accumulated per-period partials: per-(epoch, period)
    max-dedup (idempotent under epoch replay), then one period-keyed
    sum — the recovered series ``(period, n, v)``."""
    return (
        spark.read.parquet(out_path)
        .groupBy("epoch_id", "period")
        .agg(F.max("n").alias("n"), F.max("v").alias("v"))
        .groupBy("period")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("v").cast("long").alias("v"),
        )
    )


def run_streaming_reservoir(
    stream_df: DataFrame,
    ekey_expr,
    k: int,
    payload_cols: list[str],
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming weighted reservoir (A-ES over micro-batches): per
    batch, keep the ``k`` rows with the SMALLEST deterministic
    exponential order key (``ekey_expr`` — see
    :func:`~bigdata_kafka_2_spark.operators.sampling.
    weighted_sample`) and append them with the epoch id. Per-batch
    top-k partials are EXACTLY mergeable: every global winner is by
    definition inside its own batch's top-k, so a top-k over the
    union of partials equals the batch top-k over all data — any
    micro-batching converges to the same sample, and since ekeys are
    deterministic per row, replayed epochs re-append identical rows
    that a distinct() removes. State is O(k) per epoch, never data-
    sized. The streaming face of the corpus-subsampling primitive:
    a rolling ingest keeps a always-current weighted sample without
    rescanning history.

    REQUIREMENT: ``payload_cols`` must uniquely key each BATCH (a
    doc_id-like column). :func:`read_reservoir`'s replay-dedup is
    epoch-aware — ``distinct()`` over (epoch_id, payload, ekey) — so
    a payload value recurring in DIFFERENT batches is handled exactly
    (each arrival lives in its own epoch partial, as in batch
    ``weighted_sample``); only two identical payload rows in the SAME
    micro-batch are indistinguishable from a replay twin, and
    :func:`read_reservoir` detects that case (non-uniform row
    multiplicity inside an epoch — a replay duplicates the whole
    partial uniformly) and raises instead of silently collapsing
    (r12 advice: the contract is enforced, not just documented).
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(
                *payload_cols, ekey_expr.alias("ekey")
            )
            .orderBy(F.col("ekey").asc(), *payload_cols)
            .limit(int(k))
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_reservoir(
    spark: SparkSession, out_path: str, k: int, payload_cols: list[str]
) -> DataFrame:
    """Merge the per-epoch reservoir partials: drop replayed
    duplicates EPOCH-AWARE (a replay re-appends byte-identical rows
    under the SAME epoch_id, so one row per (epoch_id, payload, ekey)
    is exact — and a payload recurring across different batches keeps
    both copies, matching batch ``weighted_sample``), then one top-k
    over the O(k·epochs) union.

    Enforcement (r12 advice): a replay duplicates an epoch's whole
    partial UNIFORMLY, so every distinct row in a replayed epoch has
    the same multiplicity; a genuinely duplicate payload row inside
    one batch shows up as NON-uniform multiplicity, which this reader
    detects with one bounded aggregate over the O(k·epochs) partial
    rows and raises on, instead of silently collapsing the pair. (The
    one undetectable corner: an epoch whose EVERY row is duplicated
    the same number of times by genuine duplicates — uniform by
    construction; a unique per-batch payload key removes it.)"""
    per_row = (
        spark.read.parquet(out_path)
        .groupBy("epoch_id", *payload_cols, "ekey")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    violated = (
        per_row.groupBy("epoch_id")
        .agg(F.countDistinct("__m").alias("__k"))
        .filter(F.col("__k") > 1)
        .count()
    )
    if violated:
        raise ValueError(
            "read_reservoir: non-uniform row multiplicity inside "
            f"{violated} epoch partial(s) — the stream violated the "
            "per-batch payload-uniqueness contract (two identical "
            "payload rows landed in one micro-batch), so the replay "
            "dedup cannot be exact; key the payload uniquely (e.g. a "
            "doc_id column) and re-ingest"
        )
    return (
        per_row.select(*payload_cols, "ekey")
        .orderBy(F.col("ekey").asc(), *payload_cols)
        .limit(int(k))
        .drop("ekey")
    )


def run_streaming_wins(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming pairwise-preference ingest: accumulate a canonical
    win table from a stream of DECIDED comparisons ``(a, b, a_won)``
    (``a < b``, ``a_won`` ∈ {0,1} — one row per comparison, the
    atomic preference event an RLHF/labeling pipeline emits). Per
    micro-batch, ONE map-side-combined aggregate reduces the batch to
    |players|²-bounded win-count PARTIALS, appended with the epoch
    id.

    Mergeability is exact BY CONSTRUCTION — win counts are a
    commutative monoid, so any micro-batching of the same comparison
    stream converges to the same merged table (contrast
    :func:`run_streaming_scd2`, where invariance needed interval
    derivation): the cut point is that each comparison row is decided
    and atomic, so no state spans batches. Replay safety: a replayed
    epoch re-appends byte-identical (epoch_id, a, b, wins) partial
    rows that :func:`read_wins`' distinct() removes — the
    deterministic-partial idempotence pattern shared with
    :func:`run_streaming_reservoir`. State is O(|players|²·epochs),
    never comparison-sized.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy("a", "b")
            .agg(
                F.sum(F.col("a_won").cast("long")).alias("wins_a"),
                F.sum(
                    F.lit(1) - F.col("a_won").cast("long")
                ).alias("wins_b"),
            )
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_wins(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the per-epoch win-table partials: epoch-replay
    duplicates drop via distinct() (partials are deterministic per
    epoch), then one |players|²-bounded aggregate sums the counts —
    the exact batch win table, independent of how the stream was
    micro-batched."""
    return (
        spark.read.parquet(out_path)
        .distinct()
        .groupBy("a", "b")
        .agg(
            F.sum("wins_a").cast("long").alias("wins_a"),
            F.sum("wins_b").cast("long").alias("wins_b"),
        )
        .filter((F.col("wins_a") + F.col("wins_b")) > 0)
    )


def run_streaming_counts(
    stream_df: DataFrame,
    group_col: str,
    out_path: str,
    checkpoint: str,
) -> None:
    """Streaming grouped-count ingest: accumulate per-group counts
    from a stream, one |groups|-bounded partial per micro-batch with
    the epoch id — the :func:`run_streaming_wins` mergeable-monoid
    pattern for the simplest state there is (counts), feeding any
    count-consuming gate (the q273 streaming SRM monitor reads what
    this maintains). Replay safety: a replayed epoch re-appends
    byte-identical (epoch_id, group, n) rows that :func:`read_counts`'
    distinct() removes."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_counts(spark: SparkSession, out_path: str, group_col: str) -> DataFrame:
    """Merge the per-epoch count partials (dedup replayed epochs, sum
    the commutative-monoid counts) back to one row per group."""
    return (
        spark.read.parquet(out_path)
        .distinct()
        .groupBy(group_col)
        .agg(F.sum("n").cast("long").alias("n"))
    )
