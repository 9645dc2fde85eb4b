"""Custom Spark 4 Python data sources (``pyspark.sql.datasource``).

The reference consumes a Kafka topic (`batch_writer_consumer.py:21-33`:
subscribe, poll, commit offsets). The sandbox has no broker and no
spark-sql-kafka jars (COVERAGE.md §2.9), so the engine ships a
FUNCTIONAL stand-in with the same semantics built on the public
DataSource V2 Python API: :mod:`filelog` — an append-only segmented
log directory exposed as a batch AND streaming source with
(segment, line) OFFSETS, so Structured Streaming's checkpoint
machinery gives the same at-least-once-polling → exactly-once-commit
contract a Kafka consumer group provides. Swapping to the real
``format("kafka")`` is a one-line change (`io.read_kafka_stream`).
"""

from bigdata_kafka_2_spark.sources.filelog import (  # noqa: F401
    FileLogDataSource,
    register_filelog,
)
