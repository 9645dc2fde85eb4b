"""Sources and sinks (SURVEY.md §2.1).

The reference's bespoke IO glue (csv module row loop S1, kafka-python
producer/consumer S3/S4, pandas CSV batch sink S5) all collapses into
Spark built-ins; what remains engine-side is a thin, uniform reader
registry plus the schema-or-infer fallback the trainer implements at
``spark_model_trainer.py:190-197`` (S6).

At 100 TB the load-bearing property is that every reader here returns a
*lazy* DataFrame whose scan supports predicate pushdown and column
pruning — never a collected/materialized copy.
"""

from __future__ import annotations

import os

import numpy as _np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
#: rejects outright (PARQUET_TYPE_ILLEGAL). They are read as raw
#: nanosecond longs via ``spark.sql.legacy.parquet.nanosAsLong`` and
#: restored to microsecond timestamps (identical truncation to DuckDB's
#: ns→µs cast, keeping the oracle comparable).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver table (S8 semantics).

    Plain ``spark.read.parquet`` — vectorized reader, pushdown, pruning
    all apply. ``sf_dir`` is e.g. ``/root/testdata/sf0.01``. The conf
    is set at call time (not only session build) because the driver
    harness invokes queries with its own SparkSession.
    """
    # pin the session TZ at call time: timestamp semantics (date_trunc,
    # date_format, window alignment) must match DuckDB's naive-UTC
    # timestamps even when the harness built its own session with a
    # different timezone. NOTE: no default arg to conf.get — Spark 4
    # validates the default against the entry's converter and an empty
    # string throws INVALID_CONF_VALUE on an unset key.
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # µs-precision parquet timestamps must read as TIMESTAMP (naive-UTC
    # under the session TZ pinned above), not TIMESTAMP_NTZ — matches the
    # DuckDB oracle's plain-TIMESTAMP view and keeps epoch functions
    # (unix_micros etc.) applicable. Set here, not only at session build,
    # for the same harness-session reason as the TZ pin.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _NANOS_TS_COLUMNS.get(name, ())
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in ns_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.floor(F.col(c) / 1000).cast("long"))
            )
    return df


def read_tables(spark: SparkSession, sf_dir: str, names) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a driver table from parquet FOOTER metadata —
    no Spark job, no data read (a single-file footer or one footer per
    part file). The cheap n for data-dependent plan sizing
    (``auto_planes_per_band``): both the Spark query and the generated
    oracle SQL derive the same parameter from the same count without
    executing anything."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    corrupt_col: str | None = None,
) -> DataFrame:
    """CSV directory scan with explicit schema + inference fallback (S6).

    Reproduces ``spark_model_trainer.py:190-197``: try the declared
    schema first; if the read itself fails, retry with ``inferSchema``.
    Reading a directory is the multi-file union-all scan of S6
    (``spark_model_trainer.py:190``).

    With ``corrupt_col`` set, bad rows are retained in PERMISSIVE mode
    with the raw line captured in that column — the engine-side
    equivalent of the producer's ``bad_lines_count``
    (``producer.py:96-105``), but distributed and queryable.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        s = schema
        if corrupt_col is not None:
            s = T.StructType(
                list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
            )
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", corrupt_col
            )
        try:
            return reader.schema(s).csv(path)
        except Exception:
            pass
    return reader.option("inferSchema", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with declared schema — the batch twin of the Kafka
    value codec (F4, ``producer.py:28`` / ``batch_writer_consumer.py:31``)."""
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    """Parquet sink (S7, ``spark_model_trainer.py:109-110``).

    ``partition_by`` enables partition pruning for downstream readers —
    the scale path for date/tenant-partitioned 100 TB layouts.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (hash-partitioned-on-disk) table.

    The 100 TB co-location tool: two tables bucketed on the same key
    with the same bucket count equi-join with NO shuffle exchange on
    either side (verified in tests by asserting the plan has no
    Exchange). This is how repeated fact-fact joins (lineitem⋈orders
    every query) amortize their shuffle once at write time.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a leftover location from a previous catalog (e.g. prior session
    # against the same warehouse dir) blocks managed-table creation
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    leftover = os.path.join(wh.removeprefix("file:"), table_name.lower())
    if os.path.isdir(leftover):
        import shutil

        shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table with bucket metadata intact (must go
    through the catalog — a path read loses bucketing)."""
    return spark.table(table_name)


def to_kafka_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Encode rows into the Kafka sink wire format (S3 semantics):
    ``value`` = one JSON object per row (``producer.py:28``'s
    ``json.dumps`` codec as ``to_json(struct(*))``), optional ``key``.

    The result writes with ``.write.format("kafka")`` /
    ``writeStream.format("kafka")``; the codec itself is broker-free
    and unit-tested via the round-trip with :func:`from_kafka_frame`.
    """
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def from_kafka_frame(frame: DataFrame, schema: T.StructType) -> DataFrame:
    """Decode Kafka-shaped rows (``value`` string/binary) back into
    typed columns (S4 consumer codec, ``batch_writer_consumer.py:31``),
    then conform — unparseable payloads become default-filled rows
    (§1.2 policy)."""
    from bigdata_kafka_2_spark.schema import conform_schema

    parsed = frame.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")
    return conform_schema(parsed, schema)


def kafka_source_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector jars are on the classpath.

    The test image has no Kafka broker or connector jars, so Kafka
    sources/sinks (S3/S4) are exercised through their file/memory
    equivalents in tests; this gate keeps the real wiring importable.
    """
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "none:9092"
        ).option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka streaming source (S4 semantics).

    ``startingOffsets=earliest`` matches ``auto_offset_reset='earliest'``
    (``batch_writer_consumer.py:29-30``); consumer-group offset tracking
    is replaced by Structured Streaming checkpointing, which upgrades the
    reference's at-least-once to exactly-once into file sinks. The
    90 s idle-timeout drain (``batch_writer_consumer.py:32``) maps to
    ``trigger(availableNow=True)`` at the sink.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def zorder_code(
    col_a, col_b, bounds_a: list[float], bounds_b: list[float]
):
    """16-bit Z-order (Morton) code from two numeric columns, each
    rank-bucketed into 8 bits by its quantile ``bounds`` (255 cut
    points from ``approx_percentile``) and bit-interleaved.

    Everything is a plain codegen'd expression: the bucket index is
    ``aggregate`` over the literal boundary array (+1 per boundary ≤
    value — constant 255 ops/row regardless of data size), the
    interleave is shift/mask arithmetic.
    """
    def bucket(c, bounds):
        arr = F.lit(_np.asarray(bounds, dtype=_np.float64))
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(b <= c.cast("double"), F.lit(1)).otherwise(F.lit(0)),
        )

    a, b = bucket(col_a, bounds_a), bucket(col_b, bounds_b)
    z = F.lit(0)
    for i in range(8):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: rows are range-partitioned and
    sorted by the Morton interleave of the two columns' quantile ranks,
    so EVERY file covers a narrow range of BOTH columns at once.

    This is the multi-dimensional data-skipping layout: a sort on one
    column clusters that column only (files span the full range of the
    other), while the Z-curve keeps both columns' parquet min/max
    statistics tight — predicates on either column (or both) skip most
    row groups at the scan. The quantile boundaries are one aggregate
    (a bounded 2×255-value collect, not data); the clustered write is
    one range shuffle — the same cost as a plain sorted write.
    """
    qa, qb = (
        df.select(
            F.percentile_approx(
                F.col(c).cast("double"),
                F.lit(_np.arange(1, 256) / 256.0),
                10000,
            ).alias(f"q_{i}")
        ).first()[0]
        for i, c in enumerate(cols)
    )
    z = zorder_code(F.col(cols[0]), F.col(cols[1]), qa, qb)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by=None,
) -> dict:
    """Small-file compaction — the table-maintenance pass every
    long-lived ingest layout needs: streaming ingests and per-batch
    writes accumulate many small files, and at 100 TB the resulting
    task/driver/footer overhead dominates scans (the classic
    small-files problem). Rewrites ``path`` into
    ``ceil(bytes / target_file_bytes)`` files (per partition when
    ``partition_by`` is kept) and returns
    ``{"files_before", "files_after", "bytes"}``.

    Sizing reads ONLY filesystem metadata (no data pass); the rewrite
    goes through a temp dir and a two-rename swap. The swap is NOT
    atomic — POSIX has no atomic directory exchange — so there is a
    narrow window (between ``rename(path, old)`` and
    ``rename(tmp, path)``) where ``path`` does not exist; the data is
    never lost (it lives at the ``__compact_old`` name) and entry-time
    recovery restores it: a rerun after a crash in that window renames
    the old dir back before doing anything else, and stale
    ``__compact_tmp``/``__compact_old`` leftovers from any crashed run
    are cleaned up so they can't fail every subsequent compaction
    (r7 advice — the previous docstring over-claimed crash atomicity).
    Readers concurrent with the swap can transiently miss the table;
    run compaction from the ingest owner, not under live readers (on
    an object store or HDFS, use a rename-into-manifest table format
    for fully atomic swaps). Row contents are preserved exactly
    (asserted in tests); intra-file order is not a parquet contract
    and is not preserved.
    """
    import math
    import os
    import shutil

    def _stats(p):
        n, b = 0, 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    # Entry-time recovery/cleanup from a previously crashed run:
    if os.path.exists(old) and not os.path.exists(path):
        os.rename(old, path)  # crashed between the two renames — restore
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)

    files_before, total_bytes = _stats(path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after, _ = _stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by=None
):
    """ORC sink — the second columnar format Spark ships natively
    (zlib-compressed stripes, min/max stripe statistics, predicate
    pushdown on read: the same data-skipping contract as the parquet
    path, for deployments whose lake standard is ORC/Hive). Identical
    call shape to :func:`write_parquet`."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (pushdown-capable; roundtrip fidelity vs the parquet
    path — timestamps included — asserted in tests)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal raw-asset ingestion via Spark's ``binaryFile``
    source: one row per file — ``(path, modificationTime, length,
    content: binary)`` — the entry point that turns a directory of
    images/audio/any blobs into the opaque-binary + typed-metadata
    frame `operators/multimodal` processes (probe_media, feature
    extraction over mapInPandas). Column pruning applies: a
    metadata-only query (count, size histogram) never reads file
    CONTENTS, so inventory scans over a 100 TB asset lake touch only
    file listings."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def versioned_write(df: DataFrame, base: str) -> int:
    """Write a NEW immutable version of a table and atomically publish
    it: data lands in ``base/v=<n+1>/`` first, then a one-line
    manifest (``base/_latest.json``) flips via write-to-tmp +
    ``os.rename`` — the poor-man's lakehouse commit. Readers pin the
    manifest they opened, so a writer never mutates files under a
    running query (snapshot isolation), a crash before the rename
    leaves readers on the previous version (no torn table), and old
    versions remain addressable (:func:`versioned_read` time travel).
    Returns the published version number.

    At 100 TB this is the pattern object-store tables need anyway:
    parquet files are immutable, commits are one small-object swap,
    and cleanup of superseded versions is a separate retention pass
    (never the writer's job).
    """
    import json
    import os

    os.makedirs(base, exist_ok=True)
    current = [
        int(d[2:])
        for d in os.listdir(base)
        if d.startswith("v=") and d[2:].isdigit()
    ]
    version = max(current, default=0) + 1
    df.write.mode("overwrite").parquet(os.path.join(base, f"v={version}"))
    tmp = os.path.join(base, "_latest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.rename(tmp, os.path.join(base, "_latest.json"))
    return version


def versioned_read(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read a versioned table: the published version by default, or an
    explicit ``version`` for time travel. Unpublished (crashed) data
    dirs are invisible — only the manifest makes a version live."""
    import json
    import os

    if version is None:
        with open(os.path.join(base, "_latest.json")) as fh:
            version = int(json.load(fh)["version"])
    return spark.read.parquet(os.path.join(base, f"v={version}"))


def table_versions(base: str) -> list[int]:
    """All data versions present on disk (published or not)."""
    import os

    return sorted(
        int(d[2:])
        for d in os.listdir(base)
        if d.startswith("v=") and d[2:].isdigit()
    )


def vacuum_versions(base: str, keep_last: int = 2) -> list[int]:
    """Retention pass for :func:`versioned_write` tables: delete data
    dirs older than the last ``keep_last`` PUBLISHED-or-newer
    versions, never touching the live manifest's version (or
    anything newer — an in-flight writer's unpublished dir is not
    garbage). Returns the versions removed. Runs as its own job on a
    cadence — the writer never cleans up (the lakehouse split that
    keeps commits O(1))."""
    import json
    import os
    import shutil

    with open(os.path.join(base, "_latest.json")) as fh:
        live = int(json.load(fh)["version"])
    versions = table_versions(base)
    keep = set(v for v in versions if v >= live) | set(
        sorted([v for v in versions if v <= live])[-keep_last:]
    )
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(base, f"v={v}"), ignore_errors=True)
            removed.append(v)
    return removed


def write_with_metrics(
    df: DataFrame,
    path: str,
    metric_cols: dict[str, "F.Column"] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Parquet write with SINGLE-PASS pipeline metrics via Spark's
    Observation API: the returned dict carries ``n_rows`` plus any
    caller-supplied aggregate expressions (null counts, sums, min/max
    quality gates), all computed DURING the write itself — at 100 TB
    the difference between metrics-for-free and a second full scan
    (``df.count()`` after a write re-executes the whole lineage
    unless the caller remembered to cache). The observation hooks the
    exact rows the writer consumed, so the numbers are guaranteed to
    describe THIS output — a post-hoc scan of a concurrently-updated
    table is not.

    ``metric_cols``: name → aggregate Column (e.g. ``{"null_text":
    F.count(F.when(F.col("text").isNull(), 1))}``).
    """
    from pyspark.sql import Observation

    metrics = dict(metric_cols or {})
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        *[c.alias(k) for k, c in metrics.items()],
    )
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
