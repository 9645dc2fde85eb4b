"""Property-based equivalence for the lossless-pruning operators:
random corpora must give prefix-filtered == exact (Jaccard, set and
weighted) and skyline == brute-force dominance — the theorems hold on
adversarial small inputs (empty docs, single tokens, all-identical,
heavy repeats), not just the driver fixtures."""

from __future__ import annotations

from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_kafka_2_spark.operators import dedup as DD
from bigdata_kafka_2_spark.operators.relational import skyline_2d

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary forces heavy token sharing (the hard case for the
# prefix theorems: everything is a hot token)
_doc = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee"]),
    min_size=0,
    max_size=12,
).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=10)


def _r4(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


@given(docs=_corpus, threshold=st.sampled_from([0.2, 0.5, 0.8]))
@settings(**_SETTINGS)
def test_prefix_filter_equals_exact_random(spark, docs, threshold):
    d = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in DD.ngram_jaccard_pairs(d, k=3, threshold=threshold).collect()
    }
    pf = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in DD.prefix_filter_jaccard_pairs(
            d, k=3, threshold=threshold
        ).collect()
    }
    assert pf == exact


@given(docs=_corpus, threshold=st.sampled_from([0.3, 0.6]))
@settings(**_SETTINGS)
def test_weighted_jaccard_equals_brute_random(spark, docs, threshold):
    d = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in DD.weighted_jaccard_pairs(d, threshold=threshold).collect()
    }
    tfs = {
        i: Counter(w for w in t.split() if w) for i, t in enumerate(docs)
    }
    brute = {}
    ids = sorted(tfs)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            ca, cb = tfs[a], tfs[b]
            smin = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
            if not smin:
                continue
            j = _r4(
                smin / (sum(ca.values()) + sum(cb.values()) - smin)
            )
            if j >= threshold:
                brute[(a, b)] = j
    assert got == brute


_pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=15,
)


@given(pts=_pts)
@settings(**_SETTINGS)
def test_skyline_equals_dominance_random(spark, pts):
    d = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        ["id", "x", "y"],
    )
    got = {r["id"] for r in skyline_2d(d, "x", "y").collect()}
    brute = {
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            px >= x and py >= y and (px > x or py > y)
            for j, (px, py) in enumerate(pts)
        )
    }
    assert got == brute
