"""SparkSession factory.

The reference builds bare ``local[*]`` sessions with no tuning
(``spark_model_trainer.py:178``, ``api.py:55-58``) and even disables
whole-stage codegen for single-row inference (``api.py:58``). The new
engine keeps codegen ON and configures the session for analytic work:

- AQE on (runtime shuffle-partition coalescing, join-strategy switching,
  skew-join splitting) — the scale path for 100 TB inputs where static
  planning misjudges cardinalities.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a
  real cluster this would be ~2-3x total executor cores and AQE coalesces
  down from there.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow enabled for any pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


#: Minimum free tmpfs space before shuffle scratch prefers RAM over disk.
#: tmpfs is typically capped at half of RAM; an unexpectedly large spill
#: (e.g. the 10x scale probe) must degrade to disk, not fail ENOSPC.
_SHM_MIN_FREE_BYTES = 16 << 30


def _local_dir() -> str:
    """Scratch dir for shuffle files: env override, else tmpfs (only
    when comfortably free), else /tmp."""
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        import shutil

        if shutil.disk_usage(shm).free >= _SHM_MIN_FREE_BYTES:
            return os.path.join(shm, "spark_graft_local")
    return os.path.join(tempfile.gettempdir(), "spark_graft_local")


def get_spark(
    app_name: str = "bigdata_kafka_2_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. In
    local mode the driver is the only JVM, so ``spark.driver.memory``
    is the sole memory knob; on a cluster these settings move to
    executor config unchanged.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by SIZE, not parallelism-first:
        # with parallelism-first (the default) AQE keeps ~one reduce task
        # per core even when the shuffle is kilobytes, and per-task
        # scheduling overhead dominates small stages (measured 1.0-2.6 s
        # vs 0.3-0.5 s for a 1M-row groupBy on this host). On a large
        # cluster size-based coalescing is equally right: reducer count
        # tracks data volume (advisoryPartitionSizeInBytes), so 100 TB
        # shuffles still fan out to thousands of reducers.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Shuffle/spill scratch space: prefer RAM-backed tmpfs when the
        # host provides one ($SPARK_GRAFT_LOCAL_DIR overrides). Local-mode
        # shuffles at test SFs are MBs — far below tmpfs capacity — and
        # the disk-backed default measurably slows small stages here. On a
        # real cluster this setting is replaced by the node's local-SSD
        # spill dirs (yarn/k8s provide them); it is a local-mode knob, not
        # part of the 100 TB design.
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        # static conf: catalog tables (bucketing) land in tmp, not cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "spark_graft_warehouse"),
            ),
        )
        # Parquet scans: vectorized reader is default-on; keep rebase modes
        # deterministic for the synthetic data.
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # The driver's parquet timestamps are timezone-less (timestamp[us]).
        # Read them as TIMESTAMP (session-TZ = UTC above), not TIMESTAMP_NTZ:
        # matches the DuckDB oracle's plain-TIMESTAMP view of the same files
        # and keeps epoch-based functions (unix_micros etc.) applicable.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
