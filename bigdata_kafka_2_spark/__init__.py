"""bigdata_kafka_2_spark — a PySpark-native analytics engine.

A ground-up Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``naufalhakims/bigdata-kafka-2``
(Kafka + PySpark streaming-ingest + ML-serving for food-nutrition data),
extended with the relational operator surface and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
described in SURVEY.md.

Design stance (SURVEY.md §7): no custom execution machinery. The engine is
a thin, well-tested operator library + pipeline definitions over the
DataFrame / SQL / MLlib / Structured Streaming APIs, with Catalyst and
Tungsten doing the physical planning. Every operator is declared
logically; optimization (pushdown, pruning, join selection, AQE) is
delegated to Spark.
"""

from bigdata_kafka_2_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
