"""snapshot_diff and sequence_pattern_counts: planted fixtures with
hand-computed ground truth."""

from __future__ import annotations

import datetime as dt

from bigdata_kafka_2_spark.operators.cdc import snapshot_diff
from bigdata_kafka_2_spark.operators.timeseries import (
    sequence_pattern_counts,
)


def test_snapshot_diff_planted(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        ["k", "bal", "seg"],
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "A"),      # unchanged -> dropped
            (2, 25.0, "B2"),     # two columns changed
            (3, None, "C"),      # NULL == NULL (null-safe) -> unchanged
            (5, 50.0, "E"),      # added
        ],
        ["k", "bal", "seg"],
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "bal,seg"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_snapshot_diff_null_transitions(spark):
    """NULL -> value and value -> NULL are both 'changed' (null-safe
    comparison, not SQL three-valued logic)."""
    old = spark.createDataFrame([(1, None), (2, 5.0)], ["k", "bal"])
    new = spark.createDataFrame([(1, 9.0), (2, None)], ["k", "bal"])
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: ("changed", "bal"), 2: ("changed", "bal")}


def test_sequence_patterns_planted(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: v c p v p  -> 'v[^p]*p' matches twice (vcp, vp)
    for i, ev in enumerate(["view", "click", "purchase", "view",
                            "purchase"]):
        rows.append((1, i, base + dt.timedelta(minutes=i), ev))
    # user 2: p v c -> no complete conversion
    for i, ev in enumerate(["purchase", "view", "click"]):
        rows.append((2, i, base + dt.timedelta(minutes=i), ev))
    # user 3: equal timestamps — tiebreak on event_id orders v before p
    rows.append((3, 0, base, "view"))
    rows.append((3, 1, base, "purchase"))
    d = spark.createDataFrame(rows, ["user_id", "event_id", "ts",
                                     "event_type"])
    got = {
        r["user_id"]: (r["seq_len"], r["n_matches"])
        for r in sequence_pattern_counts(
            d, "user_id", "ts", "event_type", "v[^p]*p",
            tiebreak_col="event_id",
        ).collect()
    }
    assert got == {1: (5, 2), 2: (3, 0), 3: (2, 1)}


def test_boolean_search_planted(spark):
    from bigdata_kafka_2_spark.operators.text import boolean_search

    d = spark.createDataFrame(
        [
            (1, "data table spark extra"),      # must+should, no NOT -> in
            (2, "data table hash scan"),        # NOT term -> out
            (3, "data table other words"),      # no should term -> out
            (4, "data spark hash"),             # missing 'table' -> out
            (5, "Data TABLE Spark"),            # case-normalized -> in
            (6, "data data table table spark"), # repeats counted once -> in
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_must"], r["n_should"])
        for r in boolean_search(
            d, must=["data", "table"], should=["spark", "hash"],
            must_not=["scan"],
        ).collect()
    }
    assert out == {1: (2, 1), 5: (2, 1), 6: (2, 1)}


def test_boolean_search_empty_clauses(spark):
    from bigdata_kafka_2_spark.operators.text import boolean_search

    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], ["doc_id", "text"]
    )
    # only must_not: every doc containing the term is excluded, but
    # docs with NO query term at all have no posting row -> absent.
    got = {r["doc_id"] for r in boolean_search(
        d, must=["beta"], must_not=["gamma"]).collect()}
    assert got == {1}


def test_coalesce_intervals_planted(spark):
    import datetime as dt

    from bigdata_kafka_2_spark.operators.timeseries import (
        coalesce_intervals,
    )

    t0 = dt.datetime(2024, 1, 1)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    d = spark.createDataFrame(
        [
            (1, m(0), m(10)),    # island A
            (1, m(5), m(12)),    # overlaps -> A
            (1, m(12), m(20)),   # TOUCHES end-exclusive -> A
            (1, m(30), m(40)),   # island B
            (2, m(0), m(1)),     # island C (other key)
        ],
        ["k", "s", "e"],
    )
    out = {
        (r["k"], r["island_start"], r["island_end"]): r["n_merged"]
        for r in coalesce_intervals(d, "k", "s", "e").collect()
    }
    assert out == {
        (1, m(0), m(20)): 3,
        (1, m(30), m(40)): 1,
        (2, m(0), m(1)): 1,
    }


def test_trailing_window_planted(spark):
    import datetime as dt

    from bigdata_kafka_2_spark.operators.timeseries import (
        trailing_window_sum,
    )

    t0 = dt.datetime(2024, 1, 1)
    d = spark.createDataFrame(
        [
            (1, 10, t0, 1.0),
            (1, 11, t0 + dt.timedelta(seconds=30), 2.0),
            (1, 12, t0 + dt.timedelta(seconds=61), 4.0),  # first row aged out
            (2, 20, t0, 8.0),
        ],
        ["k", "eid", "ts", "v"],
    )
    out = {
        r["eid"]: (r["n_in_window"], r["sum_window"])
        for r in trailing_window_sum(
            d, "k", "ts", "v", window_sec=60, id_cols=("eid",)
        ).collect()
    }
    assert out == {
        10: (1, 1.0),
        11: (2, 3.0),
        12: (2, 6.0),   # rows at +30s and +61s; +0s is outside (61 > 60)
        20: (1, 8.0),
    }


def test_k_anonymity_planted(spark):
    from bigdata_kafka_2_spark.operators.profile import (
        k_anonymity_profile,
    )

    rows = (
        [("us", "A", 100.0)] * 5          # k ok; l FAILS (one value)
        + [("us", "B", float(i)) for i in range(3)]   # k fails; l ok
        + [("de", "A", float(i % 2)) for i in range(6)]  # both ok
    )
    d = spark.createDataFrame(rows, ["country", "seg", "salary"])
    got = {
        (r["country"], r["seg"]): (r["n"], r["n_sensitive"],
                                   r["k_ok"], r["l_ok"])
        for r in k_anonymity_profile(
            d, ["country", "seg"], "salary", k=5, l=2
        ).collect()
    }
    assert got[("us", "A")] == (5, 1, True, False)
    assert got[("us", "B")] == (3, 3, False, True)
    assert got[("de", "A")] == (6, 2, True, True)


def test_k_anonymize_residual_group(spark):
    """Failing groups collapse into '*' rows; passing groups keep
    their values; the residual group is itself k-anonymous here."""
    from bigdata_kafka_2_spark.operators.profile import (
        k_anonymity_profile,
        k_anonymize,
    )

    rows = (
        [("us", "A", float(i % 3), i) for i in range(6)]     # pass
        + [("us", "B", float(i), 100 + i) for i in range(3)]  # k-fail
        + [("de", "C", 1.0, 200), ("de", "C", 1.0, 201),
           ("de", "C", 1.0, 202), ("de", "C", 1.0, 203),
           ("de", "C", 1.0, 204)]                             # l-fail
    )
    d = spark.createDataFrame(rows, ["country", "seg", "salary", "rid"])
    rel = k_anonymize(d, ["country", "seg"], "salary", k=5, l=2)
    got = {(r["country"], r["seg"]) for r in rel.collect()}
    assert got == {("us", "A"), ("*", "*")}
    n_star = rel.filter("country = '*'").count()
    assert n_star == 8  # 3 k-fail + 5 l-fail rows
    # the residual group itself passes a second profile pass
    second = {
        (r["country"], r["seg"]): (r["k_ok"], r["l_ok"])
        for r in k_anonymity_profile(
            rel, ["country", "seg"], "salary", k=5, l=2
        ).collect()
    }
    assert second[("*", "*")] == (True, True)
    assert second[("us", "A")] == (True, True)
    # non-quasi columns pass through untouched
    assert rel.filter("rid = 0").count() == 1


def test_rrf_fuse_planted(spark):
    from bigdata_kafka_2_spark.operators.evalmetrics import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"]
    )
    den = spark.createDataFrame(
        [(3, 1), (4, 2)], ["doc_id", "rank"]
    )
    out = {
        r["doc_id"]: (r["rank_lex"], r["rank_dense"], r["rrf"])
        for r in rrf_fuse(
            [("lex", lex), ("dense", den)], "doc_id", k0=60, topk=10
        ).collect()
    }
    # doc 3 appears in BOTH lists -> highest fused score
    assert out[3] == (3, 1, round(1 / 63 + 1 / 61, 6))
    assert out[1] == (1, None, round(1 / 61, 6))
    assert out[4] == (None, 2, round(1 / 62, 6))
    assert max(out, key=lambda k: out[k][2]) == 3
