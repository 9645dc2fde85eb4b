"""Graph-analytics queries (charter extension: link-based centrality —
the quality signal web-corpus curation derives from hyperlink graphs,
expressed here over the purchase graph the relational tables induce)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators.graph import (
    build_purchase_graph,
    pagerank,
    pagerank_oracle_sql,
)
from bigdata_kafka_2_spark.plans import register


@register(
    "q144_pagerank",
    oracle=pagerank_oracle_sql(damping=0.85, iterations=5),
    description="Weighted PageRank with dangling-mass redistribution "
    "over the customer→supplier purchase graph, 5 unrolled power "
    "iterations (operators/graph.pagerank): edges are revenue-share "
    "normalized (exact-DECIMAL sums, one orderkey join + one window "
    "that reuses the src clustering), each iteration is one src-keyed "
    "join + one dst-keyed map-side-combined aggregate + a broadcast "
    "1-row dangling sum, and edges/nodes/ranks are localCheckpointed "
    "so the k-iteration lineage stays LINEAR (the dataflow twin of "
    "the oracle's AS MATERIALIZED CTEs). Contributions round to "
    "integer 1e-12 units and sum as BIGINTs (exact and "
    "order-independent like the DECIMAL money sums but codegen-fast; "
    "mass conservation bounds every sum at 1e12 ≪ 2^63), making the "
    "whole iteration bit-reproducible against the unrolled-CTE "
    "oracle. The "
    "link-centrality quality signal of web-scale curation, plus the "
    "engine's representative for ITERATIVE graph dataflow beyond the "
    "dedup family's connected components.",
    tags=("graph", "iterative", "join", "aggregate"),
)
def q144_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    edges = build_purchase_graph(orders, lineitem)
    return pagerank(spark, edges, damping=0.85, iterations=5, label=True)
