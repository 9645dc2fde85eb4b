"""Prefix-filtering similarity join: losslessness vs the exact
all-pairs join, and the candidate-pruning effect that is its reason to
exist."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators import dedup as DD
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_prefix_filter_equals_exact(spark):
    """The theorem, empirically: prefix-filtered output == all-pairs
    exact join, at two thresholds (including one where t*L is often
    integral, exercising the ceil guard)."""
    d = _docs(spark)
    for t in (0.25, 0.5):
        exact = _pairs_set(DD.ngram_jaccard_pairs(d, k=3, threshold=t))
        pf = _pairs_set(DD.prefix_filter_jaccard_pairs(d, k=3, threshold=t))
        assert pf == exact, f"threshold {t}"
        assert exact, f"fixture should contain pairs at {t}"


def test_prefix_filter_prunes_candidates(spark):
    """The point of the operator: the prefix join forms strictly fewer
    candidate pairs than the full inverted-index join."""
    d = _docs(spark)
    sh = DD.shingles(d, "text", "doc_id", 3)
    full = (
        sh.select(F.col("doc_id").alias("id_a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    # reconstruct the candidate stage exactly as the operator builds it
    from pyspark.sql import Window

    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("__df").asc(), F.col("shingle").asc()
    )
    w_all = Window.partitionBy("doc_id")
    ranked = sh.join(dfreq, "shingle").select(
        "doc_id",
        "shingle",
        F.row_number().over(w_rank).alias("__pos"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    t = 0.25
    plen = F.col("__n") - F.ceil(F.lit(t) * F.col("__n") - F.lit(1e-9)) + 1
    prefix = ranked.filter(F.col("__pos") <= plen)
    cand = (
        prefix.select(F.col("doc_id").alias("id_a"), "shingle", "__n")
        .withColumnRenamed("__n", "__n_a")
        .join(
            prefix.select(F.col("doc_id").alias("id_b"), "shingle", "__n")
            .withColumnRenamed("__n", "__n_b"),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("__n_a", "__n_b")
            >= F.lit(t) * F.greatest("__n_a", "__n_b") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    assert cand < full, (cand, full)
    # and candidates still cover every true pair (theorem direction)
    exact = DD.ngram_jaccard_pairs(d, k=3, threshold=t).count()
    assert cand >= exact


def test_prefix_filter_planted_hot_shingle(spark):
    """A stopword-like shingle shared by EVERY doc lands in suffixes
    (highest df) and creates no candidates by itself: two docs whose
    ONLY overlap is the hot shingle must not pair, while a planted
    true near-dup pair must."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different words here about space travel stuff"),
        (4, "unrelated text on cooking pasta with fresh basil leaves"),
    ]
    # append the SAME hot trigram to every doc
    hot = " common shared tail"
    d = spark.createDataFrame(
        [(i, t + hot) for i, t in rows], ["doc_id", "text"]
    )
    out = _pairs_set(DD.prefix_filter_jaccard_pairs(d, k=3, threshold=0.5))
    exact = _pairs_set(DD.ngram_jaccard_pairs(d, k=3, threshold=0.5))
    assert out == exact
    assert (1, 2) in {(a, b) for a, b, _ in out}
    assert all({a, b} <= {1, 2} for a, b, _ in out)
