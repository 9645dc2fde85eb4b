"""Scalar/vector function helpers (SURVEY.md §2.6).

All built-in ``pyspark.sql.functions`` compositions — JVM-side,
codegen-friendly, no Python UDFs. Each helper documents the reference
behavior it reproduces.
"""

from bigdata_kafka_2_spark.functions.scalar import (
    contains_term,
    cosine_similarity,
    dot,
    l2_norm,
    try_double,
)

__all__ = [
    "contains_term",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "try_double",
]
