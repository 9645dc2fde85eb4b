"""Partitioned-layout pruning: a date-partitioned parquet write must
let a date filter prune at the FILE level (PartitionFilters in the
scan, only matching partitions listed) — the 100 TB layout rule for
time-series data (io.write_parquet partition_by)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table, write_parquet
from tests.conftest import SF_DIR


def test_date_partitioned_scan_prunes(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    e = read_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_parquet(e, out, partition_by=["day"])

    q = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "day#" in plan  # the filter landed on the partition column

    # physically: only ONE partition directory is read
    import re

    m = re.search(r"Location: InMemoryFileIndex[^\[]*\[([^\]]*)", plan)
    # plan truncates long path lists; instead verify selected partition
    # count via the cheaper route — counting distinct input files
    files = q.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("day=2024-01-05" in r.f for r in files)

    # correctness preserved vs unpartitioned filter
    direct = (
        read_table(spark, SF_DIR, "events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
        .count()
    )
    assert q.count() == direct
