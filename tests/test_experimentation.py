"""Hand-checked tests for the r13 experimentation/calibration family
(two-proportion z-test, SRM gate, CUPED, MDE, isotonic calibration)
and the cross-engine special functions backing them
(operators/mathfn: shared literal-coefficient erfc + both-parity
chi-square survival)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_erfc_accuracy_and_parity(spark):
    """The A&S 7.1.26 polynomial stays within its published 1.5e-7
    bound of math.erfc, and the Spark/SQL builders agree after the
    callers' 9-dp rounding (the 1-ulp exp divergence is absorbed)."""
    import duckdb

    from bigdata_kafka_2_spark.operators.mathfn import (
        erfc_col,
        erfc_sql,
    )

    vals = [0.0, 0.05, 0.3, 0.7, 1.0, 1.3, 2.0, 2.7, 3.5]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r.x: r.e
        for r in sdf.select("x", erfc_col(F.col("x")).alias("e")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        assert abs(got[v] - math.erfc(v)) < 2e-7
        dv = con.execute(
            f"select {erfc_sql('x')} from (select CAST({v} AS DOUBLE) x)"
        ).fetchone()[0]
        assert round(dv, 9) == round(got[v], 9)


def test_chi2_sf_known_quantiles(spark):
    """Survival at the textbook 95% quantiles is 0.05 for BOTH
    parities (df 1..5 and the 15/16 edge); df outside [1, 16] is
    NULL."""
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_col

    cases = [
        (1, 3.841459),
        (2, 5.991465),
        (3, 7.814728),
        (4, 9.487729),
        (5, 11.070498),
        (15, 24.995790),
        (16, 26.296228),
        (0, 1.0),
        (17, 1.0),
    ]
    sdf = spark.createDataFrame(
        [(float(x), df) for df, x in cases], "x double, df int"
    )
    got = {
        r.df: r.p
        for r in sdf.select(
            "df", chi2_sf_col(F.col("x"), F.col("df")).alias("p")
        ).collect()
    }
    for df, _ in cases:
        if 1 <= df <= 16:
            assert abs(got[df] - 0.05) < 5e-7, (df, got[df])
        else:
            assert got[df] is None


def test_two_proportion_ztest_hand_checked(spark):
    """Arms 40/100 vs 25/100: z via the pooled form, two-sided p =
    erfc(|z|/sqrt 2); flipping the arms flips the signs only."""
    from bigdata_kafka_2_spark.operators.profile import (
        two_proportion_ztest,
    )

    rows = (
        [(True, 1)] * 40
        + [(True, 0)] * 60
        + [(False, 1)] * 25
        + [(False, 0)] * 75
    )
    df = spark.createDataFrame(rows, "arm boolean, y int")
    r = two_proportion_ztest(df, "arm", "y").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (100, 40, 100, 25)
    pool = 65.0 / 200.0
    se = math.sqrt(pool * (1 - pool) * (1 / 100.0 + 1 / 100.0))
    z = (0.4 - 0.25) / se
    assert abs(r.z - z) < 1e-5
    assert abs(float(r.p_value) - math.erfc(abs(z) / math.sqrt(2))) < 1e-6
    # degenerate: all-positive outcomes -> zero variance -> NULL
    allpos = spark.createDataFrame(
        [(True, 1)] * 3 + [(False, 1)] * 3, "arm boolean, y int"
    )
    d = two_proportion_ztest(allpos, "arm", "y").collect()[0]
    assert d.z is None and d.p_value is None


def test_srm_check_hand_checked(spark):
    """600/400 observed against an expected 50/50 of n=1000:
    chi2 = (100^2/500)*2 = 40, df = 1, p = erfc(sqrt(20)) ~ 2.5e-10
    -> flagged."""
    from bigdata_kafka_2_spark.operators.profile import srm_check

    rows = [("a",)] * 600 + [("b",)] * 400
    df = spark.createDataFrame(rows, "arm string")
    got = {r.arm: r for r in srm_check(df, "arm").collect()}
    assert got["a"].n == 600 and got["b"].n == 400
    assert got["a"].expected_n == 500.0
    assert abs(got["a"].chi2 - 40.0) < 1e-6
    assert got["a"].df == 1
    assert float(got["a"].p_value) < 1e-8
    assert got["a"].srm_flag is True
    # explicit non-equal expectation that matches -> not flagged
    ok = srm_check(
        df, "arm", expected={"a": 0.6, "b": 0.4}
    ).collect()[0]
    assert ok.chi2 == 0.0 and ok.srm_flag is False


def test_cuped_hand_checked(spark):
    """Constructed so X explains most of Y's variance: theta and the
    adjusted ATE match the closed-form moments computed in Python."""
    from bigdata_kafka_2_spark.operators.profile import (
        cuped_adjusted_ate,
    )

    # y = 2x + arm_effect + small noise pattern
    data = []
    for i in range(40):
        x = float(i % 10)
        arm = i % 2 == 0
        y = 2.0 * x + (3.0 if arm else 0.0) + (0.5 if i % 4 == 0 else 0.0)
        data.append((arm, y, x))
    df = spark.createDataFrame(data, "arm boolean, y double, x double")
    r = cuped_adjusted_ate(df, "arm", "y", "x").collect()[0]
    xs = [d[2] for d in data]
    ys = [d[1] for d in data]
    n = len(data)
    sx, sy = sum(xs), sum(ys)
    cov = sum(a * b for a, b in zip(xs, ys)) - sx * sy / n
    varx = sum(a * a for a in xs) - sx * sx / n
    vary = sum(b * b for b in ys) - sy * sy / n
    theta = cov / varx
    yt = [d[1] for d in data if d[0]]
    yc = [d[1] for d in data if not d[0]]
    xt = [d[2] for d in data if d[0]]
    xc = [d[2] for d in data if not d[0]]
    ate_raw = sum(yt) / len(yt) - sum(yc) / len(yc)
    ate_cuped = ate_raw - theta * (sum(xt) / len(xt) - sum(xc) / len(xc))
    assert abs(r.theta - theta) < 1e-4
    assert abs(r.ate_raw - ate_raw) < 1e-4
    assert abs(r.ate_cuped - ate_cuped) < 1e-4
    assert abs(r.var_reduction - cov * cov / (varx * vary)) < 1e-4
    # the whole point: the adjusted estimate is closer to the true
    # effect (3.0 + the noise-pattern offset cancels across arms at
    # this construction) than the raw one is
    assert abs(r.ate_cuped - 3.25) < abs(r.ate_raw - 3.25) + 1e-9


def test_mde_by_group_hand_checked(spark):
    """n=8 values of sd=2 around 10: MDE = 2.801585*2*sqrt(2/4)."""
    from bigdata_kafka_2_spark.operators.profile import mde_by_group

    vals = [8.0, 12.0] * 4  # mean 10, sample var 32/7... compute exact
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    r = mde_by_group(df, ["g"], "v").collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    sd = math.sqrt(var)
    want = 2.801585 * sd * math.sqrt(2.0 / (n / 2.0))
    assert r.n == n and r.mean == 10.0
    assert abs(r.sd - sd) < 1e-5
    assert abs(r.mde_abs - want) < 1e-4
    assert abs(r.mde_rel - want / mean) < 1e-4
    # n < 4 -> NULL MDE
    tiny = spark.createDataFrame(
        [("t", 1.0), ("t", 2.0)], "g string, v double"
    )
    t = mde_by_group(tiny, ["g"], "v").collect()[0]
    assert t.mde_abs is None and t.sd is not None


def test_isotonic_calibration_hand_checked(spark):
    """Rates (0.25, 0.0, 0.5) violate monotonicity at the first pair:
    PAVA pools bins 1-2 to 1/8 = 0.125 and leaves bin 3 at 0.5."""
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        isotonic_binned_calibration,
    )

    rows = (
        [(1.0, 1)] * 1 + [(1.0, 0)] * 3
        + [(2.0, 0)] * 4
        + [(3.0, 1)] * 2 + [(3.0, 0)] * 2
    )
    df = spark.createDataFrame(rows, "s double, y int")
    got = {
        r.score: r
        for r in isotonic_binned_calibration(df, "s", "y").collect()
    }
    assert got[1.0].raw_rate == 0.25 and got[2.0].raw_rate == 0.0
    assert got[1.0].iso_rate == 0.125
    assert got[2.0].iso_rate == 0.125
    assert got[3.0].iso_rate == 0.5
    # already-monotone input is returned unchanged
    mono = spark.createDataFrame(
        [(1.0, 0)] * 3 + [(1.0, 1)] * 1 + [(2.0, 1)] * 1 + [(2.0, 0)] * 1,
        "s double, y int",
    )
    g2 = {
        r.score: r
        for r in isotonic_binned_calibration(mono, "s", "y").collect()
    }
    assert g2[1.0].iso_rate == 0.25 and g2[2.0].iso_rate == 0.5


def test_isotonic_calibration_rejects_too_many_bins(spark):
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        isotonic_binned_calibration,
    )

    df = spark.createDataFrame(
        [(float(i), i % 2) for i in range(100)], "s double, y int"
    )
    with pytest.raises(ValueError, match="max_bins"):
        isotonic_binned_calibration(df, "s", "y", max_bins=64)


def test_ucb_arm_ranking_hand_checked(spark):
    """Two arms: a = 3 pulls mean 1/3, b = 1 pull mean 0; N=4.
    UCB(a) = 1/3 + sqrt(2 ln4 / 3), UCB(b) = 0 + sqrt(2 ln4 / 1) —
    the under-explored arm ranks first despite the lower mean."""
    import math as _m

    from bigdata_kafka_2_spark.operators.sampling import (
        ucb_arm_ranking,
    )

    rows = [("a", 1.0), ("a", 0.0), ("a", 0.0), ("b", 0.0)]
    df = spark.createDataFrame(rows, "arm string, r double")
    got = {r.arm: r for r in ucb_arm_ranking(df, "arm", "r").collect()}
    ua = 1.0 / 3.0 + _m.sqrt(2 * _m.log(4.0) / 3.0)
    ub = 0.0 + _m.sqrt(2 * _m.log(4.0) / 1.0)
    assert abs(got["a"].ucb - ua) < 1e-5
    assert abs(got["b"].ucb - ub) < 1e-5
    assert got["b"].rank == 1 and got["a"].rank == 2


def test_ngram_novelty_hand_checked(spark):
    """Eval doc sharing one 3-gram with train: 'x y z' seen, rest
    novel; a fully-novel doc reports rate 1.0."""
    from bigdata_kafka_2_spark.operators.dedup import ngram_novelty

    train = spark.createDataFrame(
        [(1, "x y z common tail here")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(2, "x y z totally new words"), (3, "all novel material only")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(train, ev).collect()}
    # doc 2 shingles: 'x y z','y z totally','z totally new',
    # 'totally new words' -> 1 of 4 seen in train
    assert got[2].n_grams == 4 and got[2].novel == 3
    assert got[2].novelty_rate == 0.75
    assert got[3].novelty_rate == 1.0


def test_kruskal_wallis_hand_checked(spark):
    """Three groups with no ties: H = 12/(N(N+1)) Σ R²/n − 3(N+1).
    a={1,2}, b={3,4}, c={5,6}: ranks 1..6, R=(3,7,11),
    H = 12/42·(9/2+49/2+121/2) − 21 = 12/42·89.5 − 21 ≈ 4.5714;
    a tied dataset exercises the correction (h_adj > h)."""
    from bigdata_kafka_2_spark.operators.profile import kruskal_wallis

    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
            ("c", 5.0), ("c", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    want = 12.0 / (6 * 7) * (9 / 2 + 49 / 2 + 121 / 2) - 3 * 7
    assert r.n == 6 and r.k == 3 and r.df == 2
    assert abs(r.h - want) < 1e-5
    assert r.h_adj == r.h  # no ties -> correction is 1
    # df=2 -> p = exp(-H/2) exactly
    assert abs(float(r.p_value) - math.exp(-r.h_adj / 2)) < 1e-6
    # ties: duplicate values shrink the denominator -> h_adj >= h
    tied = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 4.0),
         ("c", 4.0), ("c", 6.0)],
        "g string, v double",
    )
    rt = kruskal_wallis(tied, "g", "v").collect()[0]
    assert rt.h_adj > rt.h
    # degenerate: one group -> NULLs
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    ro = kruskal_wallis(one, "g", "v").collect()[0]
    assert ro.k == 1 and ro.h is None and ro.p_value is None


def test_simplified_silhouette_hand_checked(spark):
    """Two orthogonal centroids; members exactly on them score 1.0
    (d1=0); a vector equidistant to both scores 0."""
    from bigdata_kafka_2_spark.operators.similarity import (
        simplified_silhouette,
    )

    vecs = [
        (10, [1.0, 0.0]),   # on centroid 0 -> sil 1.0
        (11, [0.0, 1.0]),   # on centroid 1 -> sil 1.0
        (12, [1.0, 1.0]),   # 45 degrees -> equidistant -> sil 0.0
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, centroid array<double>",
    )
    got = {
        r.centroid_id: r
        for r in simplified_silhouette(e, cents).collect()
    }
    # vec 12 ties (sim 0.7071 both) -> assigned to smaller cid 0
    assert got[0].n == 2 and got[1].n == 1
    assert got[1].mean_silhouette == 1.0
    assert abs(got[0].mean_silhouette - 0.5) < 1e-6  # (1.0 + 0.0)/2


def test_cronbach_alpha_hand_checked(spark):
    """Perfectly parallel items (i2 = 2*i1) push alpha to 1; an item
    of pure noise against a constant drags it down. Closed-form check
    against numpy-free Python moments."""
    import pytest as _pytest

    from bigdata_kafka_2_spark.operators.profile import (
        cronbach_alpha_int,
    )

    rows = [(i, 2 * i, i + (1 if i % 2 == 0 else 0)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "i1 long, i2 long, i3 long")
    r = cronbach_alpha_int(df, ["i1", "i2", "i3"]).collect()[0]
    n = len(rows)
    cols = list(zip(*rows))
    tot = [sum(t) for t in rows]
    def num(xs):
        return n * sum(x * x for x in xs) - sum(xs) ** 2
    want = 1.5 * (1.0 - sum(num(c) for c in cols) / num(tot))
    assert r.n == n and r.k == 3
    assert abs(r.alpha - want) < 1e-6
    assert r.alpha > 0.9  # strongly parallel items
    with _pytest.raises(ValueError, match="2 items"):
        cronbach_alpha_int(df, ["i1"])


def test_streaming_counts_merge_and_replay(spark, tmp_path):
    """run_streaming_counts partials merge to the batch counts, and a
    replayed epoch (byte-identical partial re-append) is a no-op."""
    from bigdata_kafka_2_spark.streaming.ingest import read_counts

    out = str(tmp_path / "counts")
    p1 = spark.createDataFrame(
        [("a", 3, 0), ("b", 2, 0)], "arm string, n long, epoch_id long"
    ).select("arm", "n", "epoch_id")
    p2 = spark.createDataFrame(
        [("a", 1, 1)], "arm string, n long, epoch_id long"
    ).select("arm", "n", "epoch_id")
    p1.write.mode("append").parquet(out)
    p2.write.mode("append").parquet(out)
    p2.write.mode("append").parquet(out)  # replay of epoch 1
    got = {r.arm: r.n for r in read_counts(spark, out, "arm").collect()}
    assert got == {"a": 4, "b": 2}


def test_ks_sf_known_quantiles(spark):
    """Kolmogorov survival at the textbook quantiles, Spark side."""
    from bigdata_kafka_2_spark.operators.mathfn import ks_sf_col

    cases = [(1.3581015, 0.05), (1.2238479, 0.10),
             (1.6276236, 0.01), (0.8275735, 0.5)]
    df = spark.createDataFrame([(l,) for l, _ in cases], "lam double")
    got = {r.lam: r.q for r in df.select(
        "lam", ks_sf_col(F.col("lam")).alias("q")).collect()}
    for lam, want in cases:
        assert abs(got[lam] - want) < 5e-4, (lam, got[lam])
    # clamp: tiny lambda -> survival pins to 1, never past it
    tiny = spark.createDataFrame([(0.01,)], "lam double")
    assert tiny.select(ks_sf_col(F.col("lam")).alias("q")).collect()[0].q == 1.0


def test_groupwise_ks_fdr_hand_checked(spark):
    """A group shifted far from the rest is rejected; an identical
    group is not. D for the shifted group is checked against the
    direct two-sample computation."""
    from bigdata_kafka_2_spark.operators.profile import (
        groupwise_ks_fdr,
    )

    rows = (
        [("shift", float(100 + i)) for i in range(8)]
        + [("same_a", float(i)) for i in range(40)]
        + [("same_b", float(i)) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r for r in groupwise_ks_fdr(df, "g", "v").collect()}
    # 'shift' is fully separated from the rest -> D = 1.0
    assert got["shift"].d_stat == 1.0
    assert got["shift"].rejected is True
    # same_a vs its rest (same_b + the small shift group): the gap is
    # only the shifted fraction 8/48, not drift of same_a itself
    assert abs(got["same_a"].d_stat - round(8 / 48, 6)) < 1e-6
    assert got["same_a"].rejected is False
    assert got["shift"].p_rank == 1


def test_spearman_corr_hand_checked(spark):
    """A perfect monotone (but nonlinear) relation gives rho = 1;
    reversing one pair drops it below 1; ties use mid-ranks (checked
    against the closed-form Pearson-on-ranks)."""
    from bigdata_kafka_2_spark.operators.profile import spearman_corr

    mono = spark.createDataFrame(
        [(float(i), float(i * i * i)) for i in range(1, 9)],
        "x double, y double",
    )
    assert spearman_corr(mono, "x", "y").collect()[0].rho == 1.0
    # ties: x = [1,1,2,2], y = [1,2,3,4] -> mid-ranks x (1.5,1.5,3.5,3.5)
    tied = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (2.0, 4.0)],
        "x double, y double",
    )
    rx = [1.5, 1.5, 3.5, 3.5]
    ry = [1.0, 2.0, 3.0, 4.0]
    n = 4
    sx, sy = sum(rx), sum(ry)
    cov = sum(a * b for a, b in zip(rx, ry)) - sx * sy / n
    import math as _m

    vx = sum(a * a for a in rx) - sx * sx / n
    vy = sum(b * b for b in ry) - sy * sy / n
    want = cov / _m.sqrt(vx * vy)
    got = spearman_corr(tied, "x", "y").collect()[0]
    assert abs(got.rho - want) < 1e-6
    # constant variable -> NULL
    const = spark.createDataFrame(
        [(1.0, float(i)) for i in range(4)], "x double, y double"
    )
    assert spearman_corr(const, "x", "y").collect()[0].rho is None


def test_ngram_novelty_short_doc_full_only(spark):
    """r14 ADVICE regression: a <k-token eval/train doc emits NO
    shingles on either engine (full_only convention), so short docs
    are ABSENT from the output — never a partial-shingle row that
    would diverge from the NULL-filtered SQL transcription — and a
    short TRAIN doc contributes nothing to the seen set."""
    from bigdata_kafka_2_spark.operators.dedup import ngram_novelty

    train = spark.createDataFrame(
        [(1, "x y z common tail"), (4, "x y")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(2, "two words"), (3, "x y z only here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(train, ev).collect()}
    assert 2 not in got  # shingle-less doc absent, not 0/0
    # doc 3: 'x y z' seen (full train doc), 'y z only','z only here'
    # novel; train doc 4's partial 'x y' never forms a shingle
    assert got[3].n_grams == 3 and got[3].novel == 2


def test_srm_explicit_expected_arm_universe(spark):
    """r14 ADVICE regression: with an explicit expected dict, a dead
    expected arm densifies in with n=0 (its full E enters chi2) and
    an observed arm absent from expected raises."""
    from bigdata_kafka_2_spark.operators.profile import srm_check

    rows = [("a",)] * 600 + [("b",)] * 400
    df = spark.createDataFrame(rows, "arm string")
    # arm c expected 20% but received zero traffic: N=1000,
    # E=(400,400,200), chi2 = 200^2/400 + 0 + 200^2/200 = 300, df=2
    got = {
        r.arm: r
        for r in srm_check(
            df, "arm", expected={"a": 0.4, "b": 0.4, "c": 0.2}
        ).collect()
    }
    assert got["c"].n == 0 and got["c"].expected_n == 200.0
    assert abs(got["a"].chi2 - 300.0) < 1e-6
    assert got["a"].df == 2 and got["a"].srm_flag is True
    # observed arm not in expected -> raise, never a silent drop
    with pytest.raises(ValueError, match="not in expected"):
        srm_check(df, "arm", expected={"a": 1.0}).collect()


def test_two_proportion_ztest_null_rows_excluded(spark):
    """r14 ADVICE regression: NULL arm / NULL outcome rows are
    excluded, not coerced into arm B / non-conversion."""
    from bigdata_kafka_2_spark.operators.profile import (
        two_proportion_ztest,
    )

    rows = [
        (True, 1), (True, 0), (False, 1), (False, 0),
        (None, 1),          # NULL arm: must not land in arm B
        (True, None),       # NULL outcome: must not count in n_a
    ]
    df = spark.createDataFrame(rows, "arm boolean, y int")
    r = two_proportion_ztest(df, "arm", "y").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (2, 1, 2, 1)


def test_simplified_silhouette_requires_k2(spark):
    """r14 ADVICE regression: a single-centroid audit raises instead
    of emitting mixed NULL/0 silhouettes."""
    from bigdata_kafka_2_spark.operators.similarity import (
        simplified_silhouette,
    )

    t = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    c1 = spark.createDataFrame(
        [(0, [1.0, 0.0])], "centroid_id long, centroid array<double>"
    )
    with pytest.raises(ValueError, match=">= 2 centroids"):
        simplified_silhouette(t, c1)
