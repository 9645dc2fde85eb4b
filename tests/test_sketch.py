"""Count-min sketch: overestimate bound, mergeability, exactness at
ample width, and heavy-hitter recovery on a skewed corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators import sketch as SK


def _terms(spark):
    """Skewed term stream: term_i appears 2^(8-i) times, i=0..8, plus
    200 singleton tail terms — a heavy-hitter-friendly distribution."""
    rows = []
    for i in range(9):
        rows += [(f"hot_{i}",)] * (2 ** (8 - i))
    rows += [(f"tail_{j}",) for j in range(200)]
    return spark.createDataFrame(rows, ["term"]).repartition(8)


def test_estimate_never_undercounts(spark):
    df = _terms(spark)
    true = df.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    sk = SK.count_min_build(df, "term", depth=4, width=64)  # tight width
    est = SK.count_min_estimate(sk, df.select("term").distinct(), "term",
                                depth=4, width=64)
    bad = est.join(true, "term").filter(F.col("est_cnt") < F.col("true_cnt"))
    assert bad.count() == 0


def test_exact_at_ample_width(spark):
    # width >> vocab²: no collisions, estimate == true count everywhere
    df = _terms(spark)
    true = df.groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    sk = SK.count_min_build(df, "term", depth=4, width=1 << 18)
    est = SK.count_min_estimate(sk, df.select("term").distinct(), "term",
                                depth=4, width=1 << 18)
    off = est.join(true, "term").filter(F.col("est_cnt") != F.col("true_cnt"))
    assert off.count() == 0


def test_mergeability_shards_equal_union(spark):
    df = _terms(spark).withColumn("shard", F.pmod(F.xxhash64("term"), F.lit(3)))
    shards = [df.filter(F.col("shard") == i) for i in range(3)]
    merged = SK.count_min_merge(
        *[SK.count_min_build(s, "term") for s in shards]
    )
    whole = SK.count_min_build(df, "term")
    # cell-exact equality: same (row_idx, bucket) -> same cnt
    diff = (
        merged.alias("m")
        .join(whole.alias("w"), on=["row_idx", "bucket"], how="full")
        .filter(
            F.coalesce(F.col("m.cnt"), F.lit(0))
            != F.coalesce(F.col("w.cnt"), F.lit(0))
        )
    )
    assert diff.count() == 0


def test_topk_recovers_heavy_hitters(spark):
    df = _terms(spark)
    got = [r.term for r in SK.count_min_topk(df, "term", k=5).collect()]
    # the 5 hottest terms dominate every tail term by >= 16x; CMS noise
    # at default width cannot reorder them past the tail
    assert got == [f"hot_{i}" for i in range(5)]


def test_weighted_build_equals_preaggregated(spark):
    df = _terms(spark)
    pre = df.groupBy("term").agg(F.count(F.lit(1)).alias("w"))
    a = SK.count_min_build(df, "term")
    b = SK.count_min_build(pre, "term", weight_col="w")
    diff = (
        a.alias("x")
        .join(b.alias("y"), on=["row_idx", "bucket"], how="full")
        .filter(
            F.coalesce(F.col("x.cnt"), F.lit(0))
            != F.coalesce(F.col("y.cnt"), F.lit(0))
        )
    )
    assert diff.count() == 0


def test_sketch_size_bounded_by_grid(spark):
    df = _terms(spark)
    sk = SK.count_min_build(df, "term", depth=4, width=32)
    assert sk.count() <= 4 * 32


def test_md5_15_bucket_parity_with_duckdb(spark):
    """The portable md5_15 bucket (Spark conv/substr/md5) is
    bit-identical to the DuckDB expression bucket_sql() emits — the
    premise of q39's generated oracle. Includes non-ASCII and
    md5-edge inputs (empty string is excluded: q39 filters '')."""
    import duckdb

    terms = ["hot_0", "naïve", "日本語", "emoji🙂", "a:b", "':'", "0" * 64]
    width, seed, depth = 2048, 42, 4
    df = spark.createDataFrame([(t,) for t in terms], ["term"])
    got = (
        df.select(
            "term",
            *[
                SK._bucket(F.col("term"), i, width, seed, "md5_15").alias(f"b{i}")
                for i in range(depth)
            ],
        )
        .orderBy("term")
        .collect()
    )
    con = duckdb.connect()
    cells = ", ".join(
        f"{SK.bucket_sql('term', i, width, seed)} AS b{i}" for i in range(depth)
    )
    vals = ", ".join("('{}')".format(t.replace("'", "''")) for t in terms)
    want = con.execute(
        f"SELECT term, {cells} FROM (VALUES {vals}) AS v(term) ORDER BY term"
    ).fetchall()
    got_rows = [(r.term, *[r[f"b{i}"] for i in range(depth)]) for r in got]
    want_rows = [(t, *map(int, rest)) for t, *rest in want]
    assert sorted(got_rows) == sorted(want_rows)


def test_topk_md5_15_matches_xxhash64_set(spark):
    """Graded q39 uses the portable md5_15 family; production default is
    xxhash64. On the skewed corpus both recover the same top-k set —
    the hash family changes collisions, not heavy hitters."""
    df = _terms(spark)
    a = [r.term for r in SK.count_min_topk(df, "term", k=5).collect()]
    b = [r.term for r in SK.count_min_topk(df, "term", k=5, hash_fn="md5_15").collect()]
    assert a == b
