"""Named query registry — the driver-facing surface.

Each :class:`Query` pairs a Spark implementation ``(spark, sf_dir) ->
DataFrame`` with the equivalent ANSI SQL for the DuckDB oracle (or
``None`` for non-SQL-expressible operators, which the driver checks
rows-only). ``__spark_entry__.py`` exposes this registry verbatim.

Correctness-by-construction rules (driver contract):

- every computed column is aliased IDENTICALLY in Spark and SQL;
- floating-point aggregates are rounded to a fixed scale on BOTH sides
  so value-hashes are stable across summation orders;
- timestamps are formatted to strings on both sides (Spark session TZ is
  pinned to UTC to match DuckDB's naive timestamps);
- every top-k/limit query carries a total order (explicit tie-breaks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: add a query implementation to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side-effect: registration) and return
    the registry."""
    from bigdata_kafka_2_spark.plans import (  # noqa: F401
        dedup_queries,
        multimodal_queries,
        relational_queries,
        relational_queries2,
        similarity_queries,
        streaming_queries,
        text_queries,
        tpch_queries,
        vector_queries,
    )

    return REGISTRY
