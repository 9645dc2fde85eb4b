"""Sampling/split operators: determinism under repartitioning,
append-stability, disjoint-and-complete splits, stratified fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import sampling as S
from tests.conftest import SF_DIR


def test_hash_split_disjoint_complete_and_sized(spark):
    d = read_table(spark, SF_DIR, "documents")
    out = S.hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    sizes = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = d.count()
    assert sum(sizes.values()) == total  # complete partition
    assert 0.6 * total < sizes.get("train", 0) < 0.95 * total


def test_hash_split_stable_under_repartition_and_append(spark):
    d = read_table(spark, SF_DIR, "documents")
    a = {
        r.doc_id: r.split
        for r in S.hash_split(d, "doc_id", {"train": 0.8, "val": 0.2}).collect()
    }
    b = {
        r.doc_id: r.split
        for r in S.hash_split(
            d.repartition(17), "doc_id", {"train": 0.8, "val": 0.2}
        ).collect()
    }
    assert a == b
    # appending rows must not move existing rows between splits
    extra = d.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text",
                     "lang", "source", "n_chars")
    c = {
        r.doc_id: r.split
        for r in S.hash_split(
            d.unionByName(extra), "doc_id", {"train": 0.8, "val": 0.2}
        ).collect()
        if r.doc_id < 10_000_000
    }
    assert a == c


def test_deterministic_sample_repeatable_and_subset_monotone(spark):
    d = read_table(spark, SF_DIR, "documents")
    s10 = {r.doc_id for r in S.deterministic_sample(d, "doc_id", 0.1).collect()}
    s10b = {r.doc_id for r in S.deterministic_sample(d, "doc_id", 0.1).collect()}
    s30 = {r.doc_id for r in S.deterministic_sample(d, "doc_id", 0.3).collect()}
    assert s10 == s10b
    assert s10 <= s30  # growing the fraction only ADDS rows


def test_stratified_sample_fractions(spark):
    d = read_table(spark, SF_DIR, "documents")
    before = {r.lang: r.n for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = S.stratified_sample(d, "lang", {"en": 0.25}, key_col="doc_id")
    after = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # en downsampled to ~25%, other languages untouched
    assert after["en"] < 0.6 * before["en"]
    for lang in before:
        if lang != "en":
            assert after[lang] == before[lang]


def test_weighted_sample_deterministic_and_biased(spark):
    """A-ES weighted sampling: same (key, seed) → same sample even
    re-partitioned; across many seeds the heavy item is selected far
    more often than any light item (computed in ONE job: explode the
    seed list, per-seed top-k by the exponential order key)."""
    from bigdata_kafka_2_spark.operators.sampling import weighted_sample

    rows = [(0, 10.0)] + [(i, 1.0) for i in range(1, 10)]
    df = spark.createDataFrame(rows, ["k", "w"])

    once = sorted(r.k for r in weighted_sample(df, "w", 3, "k", seed=7).collect())
    again = sorted(
        r.k
        for r in weighted_sample(df.repartition(13), "w", 3, "k", seed=7).collect()
    )
    assert once == again

    n_seeds, kk = 200, 3
    seeds = F.explode(F.array(*[F.lit(s) for s in range(n_seeds)])).alias("seed")
    u = (
        F.pmod(F.xxhash64(F.col("k"), F.col("seed")), F.lit(1_000_000)) + 1
    ) / F.lit(1_000_001.0)
    ekey = -F.log(u) / F.col("w")
    from pyspark.sql import Window

    w = Window.partitionBy("seed").orderBy(F.col("__ekey").asc(), F.col("k").asc())
    picked = (
        df.select("k", "w", seeds)
        .withColumn("__ekey", ekey)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
    )
    rates = {
        r.k: r.n / n_seeds
        for r in picked.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rates[0] > 0.8  # the weight-10 item is nearly always sampled
    assert all(rates.get(i, 0.0) < 0.5 for i in range(1, 10))


def test_temperature_mixture_weights_properties(spark):
    from bigdata_kafka_2_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    d = read_table(spark, SF_DIR, "documents")
    w = temperature_mixture_weights(d, ["lang"], alpha=0.5).collect()
    assert abs(sum(r.weight for r in w) - 1.0) < 1e-9
    # alpha<1 compresses the range: weight ratios are sqrt of count ratios
    by_lang = {r.lang: r for r in w}
    langs = sorted(by_lang)
    for a, b in zip(langs, langs[1:]):
        ra, rb = by_lang[a], by_lang[b]
        expected = (ra.n_rows / rb.n_rows) ** 0.5
        assert abs(ra.weight / rb.weight - expected) < 1e-9


def test_temperature_mixture_sample_balances_and_is_stable(spark):
    from bigdata_kafka_2_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    d = read_table(spark, SF_DIR, "documents")
    kept = temperature_mixture_sample(
        d, ["lang"], "doc_id", total_rows=200, alpha=0.5
    )
    ids = sorted(r.doc_id for r in kept.collect())
    # size concentrates around the target
    assert 140 <= len(ids) <= 260
    # repartitioning never changes membership
    ids2 = sorted(
        r.doc_id
        for r in temperature_mixture_sample(
            d.repartition(13), ["lang"], "doc_id", total_rows=200, alpha=0.5
        ).collect()
    )
    assert ids == ids2
    # alpha=0.5 upsamples tails: every group's keep FRACTION shrinks as
    # group size grows (monotone in n by construction)
    counts = {r.lang: r for r in d.groupBy("lang").count().collect()}
    kc = {r.lang: r for r in kept.groupBy("lang").count().collect()}
    fracs = {
        lang: kc[lang]["count"] / counts[lang]["count"] for lang in kc
    }
    ordered = sorted(counts, key=lambda la: counts[la]["count"])
    # head group keeps a strictly smaller fraction than the tail group
    assert fracs[ordered[-1]] < fracs[ordered[0]]


def test_leakage_safe_split_never_straddles_clusters(spark):
    from bigdata_kafka_2_spark.operators.dedup import (
        minhash_lsh_verified_pairs,
    )
    from bigdata_kafka_2_spark.operators.sampling import leakage_safe_split

    d = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # plant near-dups of the first 30 docs (strong pairs, J >= ~0.9)
    dup = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz qqq")).alias("text"),
    )
    both = d.unionByName(dup)
    labeled = leakage_safe_split(
        both, {"train": 0.6, "val": 0.2, "test": 0.2},
        jaccard_threshold=0.5,
    )
    split_of = {r.doc_id: (r.split, r.cluster_rep) for r in labeled.collect()}
    assert len(split_of) == both.count()
    # every verified near-dup pair lands in ONE split
    pairs = minhash_lsh_verified_pairs(
        both, jaccard_threshold=0.5
    ).collect()
    planted = [(r.id_a, r.id_b) for r in pairs]
    assert len([p for p in planted if p[1] - p[0] == 1_000_000]) >= 28
    for a, b in planted:
        assert split_of[a][0] == split_of[b][0], (a, b)
    # singletons behave exactly like hash_split on their own id
    singles = [i for i, (s, rep) in split_of.items() if rep == i]
    assert len(singles) > 400
    from bigdata_kafka_2_spark.operators.sampling import hash_split
    plain = {
        r.doc_id: r.split
        for r in hash_split(both, "doc_id", {"train": 0.6, "val": 0.2, "test": 0.2}).collect()
    }
    for i in singles:
        assert split_of[i][0] == plain[i]
    # all three splits are populated
    assert {s for s, _ in split_of.values()} == {"train", "val", "test"}


def test_leakage_safe_folds_share_folds_and_cover_range(spark):
    """Planted near-dup pairs always land in the SAME fold; folds are
    0..k-1 and all non-empty at corpus scale."""
    from bigdata_kafka_2_spark.operators.dedup import (
        minhash_lsh_verified_pairs,
    )
    from bigdata_kafka_2_spark.operators.sampling import leakage_safe_folds

    d = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz qqq")).alias("text"),
    )
    both = d.unionByName(dup)
    labeled = leakage_safe_folds(both, k=5, jaccard_threshold=0.5)
    fold_of = {r.doc_id: r.fold for r in labeled.collect()}
    assert set(fold_of.values()) == {0, 1, 2, 3, 4}
    pairs = minhash_lsh_verified_pairs(
        both, jaccard_threshold=0.5
    ).collect()
    for r in pairs:
        assert fold_of[r.id_a] == fold_of[r.id_b], (r.id_a, r.id_b)


def test_ipf_raking_hits_uniform_marginals(spark):
    """After a few rounds the raked row/column marginals are within a
    hair of the uniform targets, the total mass is preserved, and the
    fit is partition-invariant."""
    import pyspark.sql.functions as F

    from bigdata_kafka_2_spark.operators.sampling import ipf_raking

    rows = (
        [("a", "x")] * 8 + [("a", "y")] * 2
        + [("b", "x")] * 1 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = ipf_raking(df, "r", "c", iterations=5)
    cells = {(x.r, x.c): x.raked_weight for x in out.collect()}
    n = len(rows)
    # each round ends on the COLUMN scaling, so column marginals are
    # exact (up to 6-dp display rounding); rows converge geometrically
    for cv in ("x", "y"):
        got = sum(v for (r, c), v in cells.items() if c == cv)
        assert abs(got - n / 2) < 1e-5, (cv, got)
    for rv in ("a", "b"):
        got = sum(v for (r, c), v in cells.items() if r == rv)
        assert abs(got - n / 2) < 0.05, (rv, got)
    # more rounds -> tighter row marginals (monotone KL convergence)
    tight = {
        (x.r, x.c): x.raked_weight
        for x in ipf_raking(df, "r", "c", iterations=8).collect()
    }
    for rv in ("a", "b"):
        got5 = sum(v for (r, c), v in cells.items() if r == rv)
        got8 = sum(v for (r, c), v in tight.items() if r == rv)
        assert abs(got8 - n / 2) <= abs(got5 - n / 2)
    a = sorted(ipf_raking(df, "r", "c", iterations=3).collect())
    b = sorted(
        ipf_raking(df.repartition(7), "r", "c", iterations=3).collect()
    )
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="iterations"):
        ipf_raking(df, "r", "c", iterations=0)
