"""Frequent pairs + triangle counting: planted-graph ground truth,
a-priori prune losslessness, orientation invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.graph import (
    cooccurrence_edges,
    triangle_counts,
)
from bigdata_kafka_2_spark.operators.itemsets import frequent_pairs


def test_triangles_planted_graph(spark):
    """K4 plus a pendant vertex: K4 has 4 triangles; each K4 vertex
    touches 3; the pendant touches 0 (absent from output)."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(3, 9)], ["a", "b"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_total_matches_bruteforce(spark, tmp_path):
    """On the real co-purchase graph: Σ per-vertex / 3 == brute-force
    triangle count from adjacency sets."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    per_vertex = triangle_counts(edges)
    total3 = per_vertex.agg(F.sum("n_triangles")).collect()[0][0]
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        adj.setdefault(r["a"], set()).add(r["b"])
        adj.setdefault(r["b"], set()).add(r["a"])
    brute = sum(
        1
        for a in adj
        for b in adj[a]
        if a < b
        for c in (adj[a] & adj[b])
        if b < c
    )
    assert total3 == 3 * brute
    assert brute > 0


def test_frequent_pairs_prune_is_lossless(spark):
    """a-priori prune vs no prune (min_support=1 disables it on the
    support side but keeps the same pipeline): planted baskets where a
    high-support pair coexists with items below support."""
    rows = [
        (1, "a"), (1, "b"), (1, "x"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "y"),
        (4, "x"), (4, "y"),
    ]
    d = spark.createDataFrame(rows, ["bk", "item"])
    got = {
        (r["item_a"], r["item_b"]): (r["support"], r["conf_ab"], r["lift"])
        for r in frequent_pairs(d, "bk", "item", min_support=3).collect()
    }
    # only (a,b) reaches support 3; sup(a)=sup(b)=3, n_baskets=4
    assert set(got) == {("a", "b")}
    s, conf, lift = got[("a", "b")]
    assert s == 3 and conf == 1.0
    assert lift == round(3 * 4 / (3 * 3), 4)


def test_label_propagation_planted_communities(spark):
    """Two K4 cliques joined by one bridge edge: after 3 rounds every
    clique member carries its clique's minimum id; the bridge does
    not merge them (each side's internal majority dominates)."""
    from bigdata_kafka_2_spark.operators.graph import label_propagation

    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(k4a + k4b + [(3, 10)], ["a", "b"])
    got = {r["node"]: r["label"] for r in
           label_propagation(edges, iterations=3).collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_personalized_pagerank_properties(spark):
    """Seed locality: mass stays in the seed's reachable component;
    a disconnected component scores 0; ranks sum to ~1."""
    from bigdata_kafka_2_spark.operators.graph import (
        personalized_pagerank,
    )
    from pyspark.sql import functions as F

    # two components: 1->2->3 (seeded at 1) and 10->11
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (10, 11, 1.0)],
        ["src", "dst", "w"],
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    r = {
        row["node"]: row["rank"]
        for row in personalized_pagerank(
            spark, edges, seeds, iterations=8
        ).collect()
    }
    assert r[10] == 0.0 and r[11] == 0.0      # unreachable from seed
    assert r[1] > 0 and r[2] > 0 and r[3] > 0  # mass flows out
    assert abs(sum(r.values()) - 1.0) < 1e-6   # conservation
    # (no decay assertion: 3 is a sink and correctly ACCUMULATES —
    # its dangling mass teleports back to the seed each round)
