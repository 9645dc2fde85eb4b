"""Self-check harness mirroring the driver's CORRECTNESS gate: every
registered query with an oracle must match DuckDB on row count, column
names, and order-insensitive canonical values; oracle-less queries must
at least run and produce a stable schema."""

from __future__ import annotations

import pytest

from bigdata_kafka_2_spark.plans import load_extended
from tests.conftest import SF_DIR
from tests.oracle_utils import canon_frame

REGISTRY = load_extended()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    spark_pdf = q.spark_fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(q.oracle).df()

    s_cols, s_rows = canon_frame(spark_pdf)
    d_cols, d_rows = canon_frame(duck_pdf)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
