"""Physical-plan regression tests: the scale-critical plan properties
(pushdown, pruning, broadcast choice, top-k strategy, partial
aggregation) asserted so a future logical-plan change can't silently
regress the physical strategy."""

from __future__ import annotations

import re

import pytest

from bigdata_kafka_2_spark.plans import load_extended
from tests.conftest import SF_DIR

REGISTRY = load_extended()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_columns(plan: str) -> set[str]:
    """Columns actually read by the (first) parquet FileScan — the
    bracketed list after 'FileScan parquet'; ReadSchema is truncated in
    long plan strings."""
    m = re.search(r"FileScan parquet (?:\S+ )?\[([^\]]*)\]", plan)
    return {c.split("#")[0] for c in m.group(1).split(",") if c}


def test_q01_filter_pushdown_and_pruning(spark):
    p = _plan(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # only the 7 referenced columns are read — never the full 10-col row
    assert _scan_columns(p) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_q02_point_lookup_pushdown(spark):
    p = _plan(spark, "q02_point_lookup")
    assert "EqualTo(o_orderkey,42)" in p


def test_q06_dim_join_is_broadcast(spark):
    p = _plan(spark, "q06_join_broadcast_dim")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q07_dims_broadcast_and_date_pushdown(spark):
    p = _plan(spark, "q07_multiway_join_revenue")
    assert p.count("BroadcastHashJoin") >= 3  # customer/nation/region dims
    assert "GreaterThanOrEqual(o_orderdate" in p


def test_q10_topk_avoids_global_sort(spark):
    p = _plan(spark, "q10_global_topk")
    assert "TakeOrderedAndProject" in p


def test_q50_probe_broadcast_table_never_shuffles(spark):
    p = _plan(spark, "q50_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "Exchange hashpartitioning" not in p  # table side unshuffled


def test_q40_partial_aggregation(spark):
    p = _plan(spark, "q40_exact_dedup_groups")
    # two-phase hash aggregate (map-side partial + final)
    assert len(re.findall(r"HashAggregate", p)) >= 2


def test_q30_metadata_projection_prunes_text_siblings(spark):
    p = _plan(spark, "q30_token_stats")
    cols = _scan_columns(p)
    assert "lang" not in cols and "source" not in cols


@pytest.mark.parametrize(
    "name",
    ["q04_conditional_label_balance", "q15_orders_by_month", "q20_json_extract"],
)
def test_no_python_udfs_in_relational_paths(spark, name):
    # relational/text built-in queries must stay fully JVM-side
    p = _plan(spark, name)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_driver_contract_oracle_sql_strings():
    """__spark_entry__.oracle_sql() must hand the driver PLAIN SQL
    strings for every graded query: callable (dataset-parameterized)
    oracles resolve at this boundary, never leak through, and resolve
    against the grading sf (q53's auto-sized plane count must match
    what its Spark fn derives from the same dataset)."""
    import importlib
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    mod = importlib.import_module("__spark_entry__")
    oracles = mod.oracle_sql()
    assert len(oracles) == 50
    bad = {n: type(s).__name__ for n, s in oracles.items() if not isinstance(s, str)}
    assert not bad, f"non-string oracle SQL: {bad}"

    from bigdata_kafka_2_spark.io import parquet_row_count
    from bigdata_kafka_2_spark.operators.similarity import auto_planes_per_band
    from bigdata_kafka_2_spark.plans import GRADING_SF_DIR

    r = auto_planes_per_band(parquet_row_count(GRADING_SF_DIR, "embeddings"))
    assert oracles["q53_lsh_bucketed_near_dup"].count("list_dot_product") == 8 * r
