"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``bigdata_kafka_2_spark.plans`` — the engine's named
query registry. Each registry entry pairs a Spark implementation with
its DuckDB oracle SQL (or ``None`` for non-SQL-expressible operators,
which the driver checks rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust under file-path import (importlib.spec_from_file_location):
# the engine package lives next to this file
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from bigdata_kafka_2_spark.plans import load_all, resolve_oracle  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].spark_fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops omitted.

    Dataset-parameterized oracles (e.g. q53's auto-sized LSH planes)
    resolve against the driver's grading dataset
    (``$SPARK_GRAFT_ORACLE_SF_DIR``, default sf0.01) — the same count
    the Spark query reads, so both sides derive identical plans."""
    out: dict[str, str] = {}
    for name, q in load_all().items():
        sql = resolve_oracle(q)
        if sql is not None:
            out[name] = sql
    return out
