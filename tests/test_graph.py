"""Graph-analytics operator tests: weighted PageRank vs a numpy
reference power iteration (same rounding schedule), invariants, and
the purchase-graph builder's stochasticity."""

from __future__ import annotations

import pytest

from bigdata_kafka_2_spark.operators.graph import (
    _RANK_SCALE,
    build_purchase_graph,
    pagerank,
)
from tests.conftest import SF_DIR


def _round_half_up(x: float) -> float:
    """Spark's round(double, 12): BigDecimal.valueOf(double) — i.e.
    the SHORTEST round-trip decimal repr, not the exact binary
    expansion — then setScale(12, HALF_UP). Python's repr() produces
    the same shortest string, so Decimal(repr(x)) reproduces it; both
    Decimal(x) (exact expansion) and built-in round() (banker's)
    diverge on the boundary cases the planted cycle graph hits."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal(f"1e-{_RANK_SCALE}"), ROUND_HALF_UP
        )
    )


def _as_units(x: float) -> int:
    """Spark's round(x * 1e12, 0) cast to long: the double product's
    shortest repr, HALF_UP to an integer count of 1e-12 units."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x * 10.0**_RANK_SCALE)).quantize(
            Decimal(1), ROUND_HALF_UP
        )
    )


def _numpy_pagerank(edges, damping=0.85, iterations=5):
    """Reference implementation with the operator's exact rounding
    schedule: 12-dp HALF_UP round of contributions before an exact
    integer-unit sum, 12-dp HALF_UP round of each iteration's rank."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    srcs = {s for s, _, _ in edges}
    r = [_round_half_up(1.0 / n)] * n
    for _ in range(iterations):
        acc = [0] * n
        for s, d, w in edges:
            acc[idx[d]] += _as_units(r[idx[s]] * w)
        contrib = [a / 10**_RANK_SCALE for a in acc]
        dang = (
            sum(_as_units(r[idx[u]]) for u in nodes if u not in srcs)
            / 10**_RANK_SCALE
        )
        r = [
            _round_half_up(
                (1 - damping) / n + damping * (contrib[i] + dang / n)
            )
            for i in range(n)
        ]
    return dict(zip(nodes, r))


PLANTED = [
    # a hub (h) fed by three spokes, one sink (z) fed by the hub, and
    # a two-node cycle (x<->y) isolated from the hub
    ("a", "h", 1.0),
    ("b", "h", 1.0),
    ("c", "h", 0.5),
    ("c", "z", 0.5),
    ("h", "z", 1.0),
    ("x", "y", 1.0),
    ("y", "x", 1.0),
]


def test_pagerank_matches_reference(spark):
    edges = spark.createDataFrame(PLANTED, "src string, dst string, w double")
    got = {
        row["node"]: row["rank"]
        for row in pagerank(spark, edges, iterations=5).collect()
    }
    want = _numpy_pagerank(PLANTED, iterations=5)
    assert got == want


def test_pagerank_mass_conserved_and_ordering(spark):
    edges = spark.createDataFrame(PLANTED, "src string, dst string, w double")
    ranks = {
        row["node"]: row["rank"]
        for row in pagerank(spark, edges, iterations=8).collect()
    }
    # dangling redistribution keeps total mass at 1 (up to rounding)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    # the sink fed by the hub outranks the hub; the hub outranks its
    # spokes; all ranks at least the teleport floor
    assert ranks["z"] > ranks["h"] > ranks["a"]
    n = len(ranks)
    assert all(r >= 0.15 / n - 1e-12 for r in ranks.values())


def test_pagerank_partitioning_invariant(spark):
    """Decimal-sum contributions make the result independent of the
    edge table's physical partitioning."""
    edges = spark.createDataFrame(PLANTED, "src string, dst string, w double")
    base = sorted(pagerank(spark, edges, iterations=3).collect())
    shuffled = sorted(
        pagerank(spark, edges.repartition(7), iterations=3).collect()
    )
    assert base == shuffled


def test_purchase_graph_row_stochastic(spark):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    g = build_purchase_graph(orders, lineitem)
    sums = (
        g.groupBy("src").agg(F.sum("w").alias("s")).collect()
    )
    assert sums and all(
        abs(row["s"] - 1.0) < 1e-9 for row in sums
    )
    # three disjoint tier tags, edges only c(0)->s(1) and s(1)->p(2)
    kinds = {
        (row["src"] % 4, row["dst"] % 4)
        for row in g.select("src", "dst").collect()
    }
    assert kinds == {(0, 1), (1, 2)}


def test_kcore_planted_cascade(spark):
    """A 4-clique with a pendant chain: the chain peels away in
    CASCADE (each removal exposes the next — the behavior a flat
    degree filter can't reproduce: chain node y starts at degree 2),
    the clique survives with within-core degrees."""
    from bigdata_kafka_2_spark.operators.graph import kcore

    # clique {1,2,3,4} + chain 4-5-6-7 (y=5 has initial degree 2)
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame(clique + chain, "a long, b long")
    out = {r.node: r.deg for r in kcore(edges, 2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=3: still the clique; k=4: empty
    assert {r.node for r in kcore(edges, 3).collect()} == {1, 2, 3, 4}
    assert kcore(edges, 4).count() == 0


def test_kcore_converges_and_bounds(spark):
    """max_rounds is honored: an impossible bound raises; the planted
    3-chain cascade needs exactly its length in rounds."""
    import pytest

    from bigdata_kafka_2_spark.operators.graph import kcore

    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(chain, "a long, b long")
    # pure path: 2-core empty (cascade from both ends)
    assert kcore(edges, 2).count() == 0
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, 2, max_rounds=1)


def test_hits_star_hand_checked(spark):
    """Two hubs pointing at one sink: authority(3) = 1, hubs split
    0.5/0.5, and every fixpoint round preserves that."""
    from bigdata_kafka_2_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 3), (2, 3)], "src long, dst long"
    )
    rows = {r.node: r for r in hits(spark, edges, iterations=3).collect()}
    assert rows[3].authority == 1.0
    assert rows[3].hub == 0.0
    assert abs(rows[1].hub - 0.5) < 1e-9
    assert abs(rows[2].hub - 0.5) < 1e-9
    assert rows[1].authority == 0.0


def test_hits_l1_normalized_and_tiered(spark):
    """On the purchase graph: authority and hub each sum to ~1, parts
    hold no hub mass (no out-edges), customers no authority mass."""
    from bigdata_kafka_2_spark.io import read_table
    from bigdata_kafka_2_spark.operators.graph import (
        build_purchase_graph,
        hits,
    )

    o = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    edges = build_purchase_graph(o, li).select("src", "dst")
    out = hits(spark, edges, iterations=2, label=True).collect()
    sa = sum(r.authority for r in out)
    sh = sum(r.hub for r in out)
    assert abs(sa - 1.0) < 1e-6 and abs(sh - 1.0) < 1e-6
    for r in out:
        if r.node.startswith("p"):
            assert r.hub == 0.0
        if r.node.startswith("c"):
            assert r.authority == 0.0


def test_khop_reachability_hand_checked(spark):
    """Path graph 1-2-3-4-5 seeded at 1: frontiers 1,1,1,1 and reach
    1,2,3,4 over 3 hops; a disconnected node is never reached."""
    from bigdata_kafka_2_spark.operators.graph import khop_reachability

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "a long, b long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    rows = {
        r.hop: (r.n_frontier, r.n_reached)
        for r in khop_reachability(edges, seeds, hops=3).collect()
    }
    assert rows == {0: (1, 1), 1: (1, 2), 2: (1, 3), 3: (1, 4)}


def test_khop_reachability_exhausted_frontier(spark):
    """Once the component is fully visited, later hops report empty
    frontiers and a flat reach."""
    from bigdata_kafka_2_spark.operators.graph import khop_reachability

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    seeds = spark.createDataFrame([(1,)], "node long")
    rows = {
        r.hop: (r.n_frontier, r.n_reached)
        for r in khop_reachability(edges, seeds, hops=3).collect()
    }
    assert rows == {0: (1, 1), 1: (1, 2), 2: (0, 2), 3: (0, 2)}
