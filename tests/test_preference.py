"""Bradley-Terry preference fitting: hand-replicated MM schedule,
partition invariance, and the MLE-existence guard."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.preference import (
    _SCALE,
    bradley_terry,
    pairwise_wins,
)


def _py_bt(matches, iterations=3):
    """Pure-python replica of the operator's exact rounding schedule:
    matches = {(a, b): (wins_a, wins_b)} with a < b."""
    def r12(x):
        return float(round(Decimal(repr(x)), _SCALE))

    players = sorted({p for ab in matches for p in ab})
    n = {}
    W = {p: 0 for p in players}
    for (a, b), (wa, wb) in matches.items():
        n[(a, b)] = n[(b, a)] = wa + wb
        W[a] += wa
        W[b] += wb
    w = {p: r12(1.0 / len(players)) for p in players}
    for _ in range(iterations):
        d = {
            p: sum(
                Decimal(repr(r12(n[(p, q)] / (w[p] + w[q]))))
                for q in players
                if (p, q) in n
            )
            for p in players
        }
        raw = {p: r12(W[p] / float(d[p])) for p in players}
        s = float(sum(Decimal(repr(v)) for v in raw.values()))
        w = {p: r12(raw[p] / s) for p in players}
    return w


def test_bradley_terry_matches_python_replica(spark):
    rows = [
        ("x", "y", 7, 3),
        ("x", "z", 2, 6),
        ("y", "z", 5, 5),
    ]
    m = spark.createDataFrame(
        rows, "a string, b string, wins_a long, wins_b long"
    )
    got = {
        r.player: r.strength
        for r in bradley_terry(m, iterations=3).collect()
    }
    want = _py_bt({(a, b): (wa, wb) for a, b, wa, wb in rows})
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # z beat x 6-2 and tied y: it should outrank x
    assert got["z"] > got["x"]


def test_bradley_terry_partition_invariant(spark):
    rows = [("x", "y", 7, 3), ("x", "z", 2, 6), ("y", "z", 5, 5)]
    m = spark.createDataFrame(
        rows, "a string, b string, wins_a long, wins_b long"
    )
    a = sorted(bradley_terry(m, iterations=2).collect())
    b = sorted(bradley_terry(m.repartition(7), iterations=2).collect())
    assert a == b


def test_bradley_terry_rejects_zero_win_player(spark):
    m = spark.createDataFrame(
        [("x", "y", 4, 0)], "a string, b string, wins_a long, wins_b long"
    )
    with pytest.raises(ValueError, match="zero wins"):
        bradley_terry(m)
    with pytest.raises(ValueError, match="iterations"):
        bradley_terry(m, iterations=0)


def test_pairwise_wins_hand_checked(spark):
    # group g1: a(1) beats b(2) beats c(3); group g2: b(1) beats a(2),
    # c ties a (both 2) -> dropped
    rows = [
        ("g1", "a", 1.0), ("g1", "b", 2.0), ("g1", "c", 3.0),
        ("g2", "b", 1.0), ("g2", "a", 2.0), ("g2", "c", 2.0),
    ]
    df = spark.createDataFrame(rows, "g string, p string, r double")
    got = {
        (x.a, x.b): (x.wins_a, x.wins_b)
        for x in pairwise_wins(df, "g", "p", "r").collect()
    }
    assert got == {
        ("a", "b"): (1, 1),
        ("a", "c"): (1, 0),   # g2 tie dropped
        ("b", "c"): (2, 0),   # b beat c in both groups
    }


def test_streaming_wins_batching_invariant_and_replay_safe(
    spark, tmp_path
):
    """The streamed win table equals the batch aggregate regardless of
    micro-batching (counts are a commutative monoid over atomic
    comparisons), and re-appending every partial (an epoch replay)
    changes nothing."""
    import pyspark.sql.functions as F2

    from bigdata_kafka_2_spark.streaming.ingest import (
        read_wins,
        run_streaming_wins,
    )

    rows = [
        ("x", "y", 1), ("x", "y", 1), ("x", "y", 0),
        ("x", "z", 0), ("y", "z", 1), ("y", "z", 1),
    ]
    df = spark.createDataFrame(rows, "a string, b string, a_won int")
    stage = str(tmp_path / "stage")
    df.repartition(3).write.parquet(stage)
    state, ckpt = str(tmp_path / "wins"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    run_streaming_wins(stream, state, ckpt)
    got = {
        (r.a, r.b): (r.wins_a, r.wins_b)
        for r in read_wins(spark, state).collect()
    }
    assert got == {
        ("x", "y"): (2, 1),
        ("x", "z"): (0, 1),
        ("y", "z"): (2, 0),
    }
    # replay: re-append all partials -> merged table unchanged
    spark.read.parquet(state).write.mode("append").parquet(state)
    again = {
        (r.a, r.b): (r.wins_a, r.wins_b)
        for r in read_wins(spark, state).collect()
    }
    assert again == got


def test_win_rate_wilson_hand_checked(spark):
    """x: 8 wins of 10 -> Wilson bounds match the closed form; the
    interval is inside (0,1) and ordered."""
    import math

    from bigdata_kafka_2_spark.operators.preference import (
        win_rate_wilson,
    )

    m = spark.createDataFrame(
        [("x", "y", 8, 2)], "a string, b string, wins_a long, wins_b long"
    )
    got = {r.player: r for r in win_rate_wilson(m).collect()}
    z = 1.959964
    n, p = 10.0, 0.8
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    spread = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert got["x"].n_decided == 10 and got["x"].wins == 8
    assert abs(got["x"].wilson_lo - (center - spread) / denom) < 1e-6
    assert abs(got["x"].wilson_hi - (center + spread) / denom) < 1e-6
    assert 0 < got["x"].wilson_lo < 0.8 < got["x"].wilson_hi < 1
    assert got["y"].win_rate == 0.2


def test_preference_cycles_hand_checked(spark):
    """Rock-paper-scissors is ONE circular triad (zeta=0 at k=3);
    adding a dominated fourth player keeps d=1 and d_max=(64-16)/24=2
    -> zeta=0.5; a fully transitive record has zero cycles."""
    from bigdata_kafka_2_spark.operators.preference import (
        preference_cycles,
    )

    rps = spark.createDataFrame(
        [("p", "r", 0, 3), ("p", "s", 3, 0), ("r", "s", 0, 3)],
        "a string, b string, wins_a long, wins_b long",
    )
    r = preference_cycles(rps).collect()[0]
    assert (r.n_players, r.n_cycles) == (3, 1)
    assert r.zeta == 0.0 and r.max_cycles == 1.0
    four = spark.createDataFrame(
        [("p", "r", 0, 3), ("p", "s", 3, 0), ("r", "s", 0, 3),
         ("p", "z", 3, 0), ("r", "z", 3, 0), ("s", "z", 3, 0)],
        "a string, b string, wins_a long, wins_b long",
    )
    r4 = preference_cycles(four).collect()[0]
    assert (r4.n_players, r4.n_cycles, r4.max_cycles) == (4, 1, 2.0)
    assert r4.zeta == 0.5
    trans = spark.createDataFrame(
        [("p", "r", 3, 0), ("p", "s", 3, 0), ("r", "s", 3, 0)],
        "a string, b string, wins_a long, wins_b long",
    )
    rt = preference_cycles(trans).collect()[0]
    assert rt.n_cycles == 0 and rt.zeta == 1.0

def test_preference_cycles_two_players_null_zeta(spark):
    """r12 advice: k=2 makes d_max=(8-8)/24=0 — zeta and max_cycles
    are undefined, so they return NULL explicitly (not a div-by-zero
    NULL-by-accident, not a fake 1.0)."""
    from bigdata_kafka_2_spark.operators.preference import (
        preference_cycles,
    )

    two = spark.createDataFrame(
        [("p", "r", 3, 1)], "a string, b string, wins_a long, wins_b long"
    )
    r = preference_cycles(two).collect()[0]
    assert (r.n_players, r.n_oriented_pairs, r.n_cycles) == (2, 1, 0)
    assert r.max_cycles is None and r.zeta is None
