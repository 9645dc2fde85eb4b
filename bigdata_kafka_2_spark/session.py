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
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
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
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
