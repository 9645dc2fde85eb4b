"""Physical-plan regressions for the round-2 scale fixes: operators
that used to funnel the whole dataset through one task (global
``Window.orderBy`` with no partition key) must now plan a
hash-partitioned window — no ``Exchange SinglePartition`` anywhere in
the ranking/carry path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import relational as R
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cumulative_slice_no_single_partition_window(spark):
    l = read_table(spark, SF_DIR, "lineitem")
    out = R.cumulative_slice(l, ["l_orderkey", "l_linenumber"], 1000)
    plan = _plan(out)
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__bkt" in plan


def test_cumulative_slice_matches_global_sort(spark):
    l = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    got = [
        (r.l_orderkey, r.l_linenumber)
        for r in R.cumulative_slice(l, ["l_orderkey", "l_linenumber"], 500)
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    ]
    want = [
        (r.l_orderkey, r.l_linenumber)
        for r in l.orderBy("l_orderkey", "l_linenumber").limit(500).collect()
    ]
    assert got == want


def test_global_row_number_is_dense_and_ordered(spark):
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey")
    ranked = R.global_row_number(o, "o_orderkey", rn_col="rn")
    rows = ranked.orderBy("rn").collect()
    assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
    keys = [r.o_orderkey for r in rows]
    assert keys == sorted(keys)


def test_unkeyed_asof_join_no_single_partition_window(spark):
    o = (
        read_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") < 50)
        .select("o_orderkey", "o_orderdate")
    )
    e = (
        read_table(spark, SF_DIR, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            (
                F.lit("1995-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(days=F.col("event_id") % 2000)
            ).alias("ets"),
        )
    )
    out = R.asof_join(
        o, e, left_ts="o_orderdate", right_ts="ets", right_cols=["event_id"]
    )
    plan = _plan(out)
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__bkt" in plan


def test_ivf_centroid_partitioned_layout_prunes_scan(spark, tmp_path):
    """The IVF scale path: vectors written partitioned by centroid_id,
    a probe restricted to n_probe cells must prune non-probed cells at
    the FILE level (PartitionFilters on centroid_id)."""
    from bigdata_kafka_2_spark.io import write_parquet
    from bigdata_kafka_2_spark.operators import similarity as SIM

    e = read_table(spark, SF_DIR, "embeddings")
    cents = e.filter(F.col("vec_id").isin([10, 20, 30, 40])).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    assigned = SIM.assign_centroids(e, cents)
    out = str(tmp_path / "ivf_cells")
    write_parquet(assigned, out, partition_by=["centroid_id"])

    probed = spark.read.parquet(out).filter(F.col("centroid_id").isin([10, 20]))
    plan = _plan(probed)
    assert "PartitionFilters" in plan
    files = probed.select(F.input_file_name().alias("f")).distinct().collect()
    assert files
    assert all(
        "centroid_id=10" in r.f or "centroid_id=20" in r.f for r in files
    )


def test_salted_join_plan_shows_salt_expansion(spark):
    """q58's plan must actually join on (key, __salt) with the dim side
    replicated via explode(sequence(...)) — i.e. the salt is in the
    physical plan, not just the API."""
    from bigdata_kafka_2_spark.plans import load_all

    reg = load_all()
    df = reg["q58_salted_join"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "__salt" in plan
    assert "Generate explode" in plan


def test_unkeyed_asof_carry_in_per_column_null_fallback(spark):
    """Cross-bucket carry-in must track the last NON-NULL value per
    COLUMN: when the right column is NULL in the latest right row before
    a bucket boundary, the next bucket's left rows must see the older
    non-null value — the single-partition last(ignorenulls) semantics
    (ADVICE r2: the row-level max-struct carry-in silently returned
    NULL here)."""
    n = 4000
    left = spark.range(1, n, 2).select(F.col("id").cast("double").alias("lts"))
    # right rows every 10 ticks; v is NULL on every 3rd row — including
    # runs of NULLs that straddle whatever quantile boundaries the
    # bucketing picks.
    right = spark.range(0, n, 10).select(
        F.col("id").cast("double").alias("rts"),
        F.when((F.col("id") / 10 % 3) != 0, F.col("id")).alias("v"),
    )
    out = {
        r.lts: r.v
        for r in R.asof_join(
            left, right, left_ts="lts", right_ts="rts", right_cols=["v"]
        ).collect()
    }

    def expected(lts):
        rts = int(lts // 10) * 10
        while rts >= 0:
            if (rts // 10) % 3 != 0:
                return rts
            rts -= 10
        return None

    assert len(out) == len(range(1, n, 2))
    bad = {
        lts: (v, expected(lts))
        for lts, v in out.items()
        if v != expected(lts)
    }
    assert not bad, f"first mismatches: {dict(list(bad.items())[:5])}"


def test_shuffle_partitions_helper_tolerates_non_numeric():
    class FakeConf:
        def __init__(self, val):
            self._v = val

        def get(self, key, default=None):
            return self._v if self._v is not None else default

    class FakeSC:
        defaultParallelism = 12

    class FakeSession:
        def __init__(self, val):
            self.conf = FakeConf(val)
            self.sparkContext = FakeSC()

    class FakeDF:
        def __init__(self, val):
            self.sparkSession = FakeSession(val)

    assert R._shuffle_partitions(FakeDF("16")) == 16
    assert R._shuffle_partitions(FakeDF("auto")) == 12
    assert R._shuffle_partitions(FakeDF(None)) == 12


def test_range_bucket_string_path_is_deterministic(spark):
    """The string-path boundary sample is ordered before the limit, so
    bucket boundaries (and the physical plan) are identical across
    runs."""
    d = read_table(spark, SF_DIR, "documents").select("text")
    a, eff_a = R._range_bucket(d, "text", 8)
    b, eff_b = R._range_bucket(d, "text", 8)
    assert eff_a == eff_b > 1
    pa = a.select("text", "__bkt").toPandas().sort_values("text").reset_index(drop=True)
    pb = b.select("text", "__bkt").toPandas().sort_values("text").reset_index(drop=True)
    assert pa.equals(pb)


def test_global_prefix_sum_no_single_partition_window(spark):
    l = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    out = R.global_prefix_sum(
        l, ["l_orderkey", "l_linenumber"], "l_quantity"
    )
    plan = _plan(out)
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(__bkt" in plan
    # semantics: exclusive prefix sum over the total order
    rows = out.orderBy("l_orderkey", "l_linenumber").collect()
    acc = 0
    for r in rows[:2000]:
        assert r.cum_before == acc
        acc += int(r.l_quantity)


def test_pack_sequences_no_single_partition_window(spark):
    from bigdata_kafka_2_spark.operators.text import pack_sequences

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(pack_sequences(d, ctx=256))
    assert "Exchange SinglePartition" not in plan


def test_semantic_dedup_assignment_aggregates_map_side(spark):
    """assign_centroids must plan a partial hash aggregate over the
    broadcast explode (shuffle carries one partial row per vector),
    never a window sort over the n*k scored rows."""
    from bigdata_kafka_2_spark.operators import similarity as SIM

    e = read_table(spark, SF_DIR, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    plan = _plan(SIM.assign_centroids(e, cents))
    assert "BroadcastNestedLoopJoin" in plan
    assert "max_by" in plan
    assert "Window" not in plan


def test_fuzzy_contamination_eval_side_broadcast(spark):
    """Both stages of the fuzzy decontamination join must broadcast
    the (tiny) eval side — the train table never shuffles."""
    from bigdata_kafka_2_spark.operators import dedup as DD

    d = read_table(spark, SF_DIR, "documents")
    train = d.filter(F.col("doc_id") % 13 != 0)
    ev = d.filter(F.col("doc_id") % 13 == 0)
    plan = _plan(DD.fuzzy_contamination_pairs(train, ev))
    assert plan.count("BroadcastHashJoin") >= 2  # bands + shingle sets
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_ivf_topk_many_cells_broadcast_and_per_probe_window(spark):
    """The per-probe cell table broadcasts into the pruned scan and
    the ranking window partitions on the probe key (never a global
    single-partition sort)."""
    from bigdata_kafka_2_spark.operators import similarity as SIM

    e = read_table(spark, SF_DIR, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    probes = e.filter(F.col("vec_id").isin([0, 1, 2]))
    assigned = SIM.assign_centroids(e, cents)
    plan = _plan(SIM.ivf_topk_many(assigned, probes, cents, k=5, n_probe=3))
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(probe_id" in plan


def test_score_buckets_thresholds_broadcast(spark):
    """Per-group quantile thresholds join back via broadcast — the
    table is never shuffled for the labeling."""
    from bigdata_kafka_2_spark.operators.sampling import score_buckets

    d = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("s")
    )
    plan = _plan(score_buckets(d, "s", group_col="lang"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repeated_substring_coverage_no_single_partition(spark):
    """The interval-union window partitions on the doc key; the gram
    document-frequency aggregate is map-side combinable (hash agg on
    the shingle key)."""
    from bigdata_kafka_2_spark.operators import dedup as DD

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(DD.repeated_substring_coverage(d, k=8))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_bitmap_semi_join_exact_and_fp_removal(spark):
    """bitmap_semi_join == the plain semi join even when m_bits is
    forced tiny (every probe row passes the bitmap as a false
    positive — the exact join must remove them all); and with a
    normal bitmap the result is identical too."""
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.relational import (
        bitmap_semi_join,
        semi_join,
    )

    big = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    keys = spark.range(100).select((F.col("id") * 13).alias("k"))
    exact = sorted(tuple(r) for r in semi_join(big, keys.distinct(), "k").collect())
    for m in (8, 1 << 20):  # m=8: bitmap saturates, all rows pass
        got = sorted(
            tuple(r)
            for r in bitmap_semi_join(big, keys, "k", m_bits=m).collect()
        )
        assert got == exact, m


def test_bitmap_semi_join_plan_broadcasts_bitmap(spark):
    """The bitmap side reaches the probe filter via broadcast (no
    shuffle of the big side before the membership filter)."""
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.relational import bitmap_semi_join

    big = spark.range(2000).select(F.col("id").alias("k"))
    keys = spark.range(100).select((F.col("id") * 3).alias("k"))
    plan = bitmap_semi_join(big, keys, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_quantile_sketch_windows_are_keyed(spark):
    """q131's ranking window is (group, block)-keyed and the estimate's
    cumulative window is group-keyed — never single-partition — and
    the broadcast-free plan keeps every exchange hash-partitioned."""
    from bigdata_kafka_2_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_estimate,
    )

    e = read_table(spark, SF_DIR, "events")
    sk = quantile_sketch_build(e, "value", "event_type", "event_id")
    plan = _plan(quantile_sketch_estimate(sk, "value", "event_type"))
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_prefix_filter_plan_no_cartesian(spark):
    """q147's candidate stage must be an equi-join on the shingle key
    with per-doc (never single-partition) windows."""
    from bigdata_kafka_2_spark.operators import dedup as DD

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(DD.prefix_filter_jaccard_pairs(d, k=3, threshold=0.25))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Exchange SinglePartition" not in plan


def test_weighted_jaccard_plan_no_cartesian(spark):
    """q171: prefix+positional candidates equi-join on tok; verify is
    the row-local map path (no token-keyed shuffle of full maps)."""
    from bigdata_kafka_2_spark.operators import dedup as DD

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(DD.weighted_jaccard_pairs(d, threshold=0.8))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "map_zip_with" in plan  # the verify runs row-locally


def test_triangle_plan_equi_joins_only(spark):
    """q153: degree orientation + adjacency intersection — every join
    is an equi-join on a vertex key; the intersection is codegen'd
    array work, not a wedge shuffle."""
    from bigdata_kafka_2_spark.operators.graph import (
        cooccurrence_edges,
        triangle_counts,
    )

    li = read_table(spark, SF_DIR, "lineitem")
    plan = _plan(triangle_counts(cooccurrence_edges(li, "l_orderkey", "l_partkey")))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "array_intersect" in plan


def test_frequent_pairs_prunes_before_pair_join(spark):
    """q152: the a-priori semi join must appear UPSTREAM of the
    per-basket self-join, and the basket-count 1-row aggregate rides
    in as a broadcast."""
    from bigdata_kafka_2_spark.operators.itemsets import frequent_pairs

    li = read_table(spark, SF_DIR, "lineitem")
    plan = _plan(frequent_pairs(li, "l_orderkey", "l_partkey", 3))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cross join only
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan


def test_personalized_pagerank_honors_broadcast_threshold(spark, monkeypatch):
    """r8 verdict weak #1: past ``broadcast_nodes`` the |V|-row
    rank/node tables must NOT be force-broadcast into the iteration
    joins (executor OOM at billion-node scale) — and the shuffle path
    must produce bit-identical ranks (the integer-unit arithmetic is
    plan-shape independent). The returned frame is checkpoint-backed,
    so the assertion is behavioral: count F.broadcast calls."""
    from bigdata_kafka_2_spark.operators import graph as G

    edges = spark.createDataFrame(
        [
            ("a", "h", 1.0),
            ("b", "h", 1.0),
            ("c", "h", 0.5),
            ("c", "z", 0.5),
            ("h", "z", 1.0),
            ("x", "y", 1.0),
            ("y", "x", 1.0),
        ],
        "src string, dst string, w double",
    )
    restart = spark.createDataFrame([("a",), ("c",)], "node string")

    with_bc = sorted(
        (r.node, r.rank)
        for r in G.personalized_pagerank(
            spark, edges, restart, iterations=3
        ).collect()
    )

    calls = []
    real = F.broadcast
    monkeypatch.setattr(
        G.F, "broadcast", lambda df: (calls.append(df.columns), real(df))[1]
    )
    shuffled = G.personalized_pagerank(
        spark, edges, restart, iterations=3, broadcast_nodes=0
    )
    no_bc = sorted((r.node, r.rank) for r in shuffled.collect())
    # the only broadcasts issued past the threshold are the 1-row
    # dangling-mass aggregates (scale-safe at any |V|) — never the
    # |V|-row rank/node/contribs tables
    assert all(cols == ["__mu"] for cols in calls)
    assert no_bc == with_bc  # and the shuffle path is bit-identical


def test_naive_bayes_no_cartesian_expansion(spark):
    """The NB scoring plan must never cross-expand vocab x classes:
    the only nested-loop joins are the broadcast 1-row/K-row constant
    frames; the token-key scoring join is an equi-join."""
    from bigdata_kafka_2_spark.operators.classify import (
        naive_bayes_predictions,
    )

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(naive_bayes_predictions(d, "lang"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the tiny constants only


def test_trigram_search_probes_index_not_corpus(spark):
    """The two-phase substring search verifies contains() only on the
    posting-intersection candidates (left-semi join upstream of the
    verify filter), never as a bare full-corpus scan."""
    from bigdata_kafka_2_spark.operators.text import trigram_search

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(trigram_search(d, "data stream"))
    assert "LeftSemi" in plan
    assert "Contains" in plan or "contains" in plan


def test_pii_ops_are_shuffle_free(spark):
    """pii_scan and pii_redact are pure projections: no Exchange of
    any kind in either plan — the 100 TB scrub-pass shape."""
    from bigdata_kafka_2_spark.operators.pii import (
        pii_redact,
        pii_release,
        pii_scan,
    )

    d = read_table(spark, SF_DIR, "documents")
    assert "Exchange" not in _plan(pii_scan(d))
    assert "Exchange" not in _plan(pii_redact(d))
    assert "Exchange" not in _plan(pii_release(d))


def test_q194_whole_plan_is_shuffle_free(spark):
    """The release QUERY, not just its operators: scan + redact are
    fused into one projection, so the whole q194 plan is a single
    scan with no Exchange and no self-join."""
    from bigdata_kafka_2_spark.plans import load_extended

    q = load_extended()["q194_pii_redacted_release"]
    plan = _plan(q.spark_fn(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_lexicon_tag_no_explode_no_shuffle(spark):
    """The compile-time lexicon matches row-locally: no Generate
    (explode) and no Exchange in the plan."""
    from bigdata_kafka_2_spark.operators.text import lexicon_tag

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(lexicon_tag(d, {"x": ("fast", "slow")}))
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_keyword_contexts_no_shuffle(spark):
    """KWIC is explode-then-filter, all row-local: no Exchange."""
    from bigdata_kafka_2_spark.operators.text import keyword_contexts

    d = read_table(spark, SF_DIR, "documents")
    assert "Exchange" not in _plan(keyword_contexts(d, "spark"))


def test_cusum_no_single_partition_window(spark):
    """The prefix sums ride global_prefix_sum's bucket construction —
    a keyed window, never Exchange SinglePartition (the final
    TakeOrdered(1) is the only global step)."""
    from bigdata_kafka_2_spark.operators.timeseries import (
        cusum_changepoint,
    )

    o = read_table(spark, SF_DIR, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "c"
        )
    )
    plan = _plan(cusum_changepoint(daily, "d", "c", unit_scale=100))
    # every window is range-bucket-keyed (the 1-row scalar TOTAL
    # aggregate plans its own bounded SinglePartition reduce, like
    # any scalar agg — that's not a data-sized exchange)
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert specs
    assert all("__bkt" in ln for ln in specs)
    assert "TakeOrderedAndProject(limit=1" in plan


def test_mutual_information_marginals_broadcast(spark):
    """MI's cell→score join broadcasts the marginal tables (they are
    level-count sized, never data sized)."""
    from bigdata_kafka_2_spark.operators.profile import (
        mutual_information,
    )

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(mutual_information(o, "o_orderpriority", "o_orderstatus"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_embedding_outliers_stats_broadcast(spark):
    """The per-dimension stats ride back as a broadcast (D rows) —
    the vector scan never sort-merge-joins its own statistics."""
    from bigdata_kafka_2_spark.operators.profile import (
        embedding_outliers,
    )

    e = read_table(spark, SF_DIR, "embeddings")
    plan = _plan(embedding_outliers(e, top_k=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrdered" in plan


def test_krippendorff_windows_unit_keyed(spark):
    """Alpha's m_u window is unit-keyed, never a single-partition
    order; the value-marginal combine rides a broadcast (the scalar
    1-row reductions plan their own bounded SinglePartition reduce,
    like any scalar agg)."""
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        krippendorff_alpha,
    )

    li = read_table(spark, SF_DIR, "lineitem")
    plan = _plan(krippendorff_alpha(li, "l_orderkey", "l_returnflag"))
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    for ln in specs:
        assert "__u" in ln
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan


def test_erasure_audit_single_scan_broadcast(spark):
    """One scan per audited table: the subject list broadcasts onto a
    left join, table rows never shuffle (no SortMergeJoin), and
    count/erased/digest reduce in one aggregate."""
    from bigdata_kafka_2_spark.io import read_table as rt
    from bigdata_kafka_2_spark.operators.incremental import (
        erasure_audit,
    )

    c = rt(spark, SF_DIR, "customer")
    subj = c.filter(F.col("c_custkey") < 50).select("c_custkey")
    plan = _plan(
        erasure_audit(
            {"customer": (c, "c_custkey", ["c_custkey", "c_name"])},
            subj,
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cohort_retention_rates_broadcast(spark):
    """rates=True broadcasts the periods-sized cohort-size table onto
    the triangle — the event table never shuffles for the rates."""
    from bigdata_kafka_2_spark.operators.timeseries import (
        cohort_retention,
    )

    e = read_table(spark, SF_DIR, "events")
    plan = _plan(
        cohort_retention(e, "user_id", "ts", grain="week", rates=True)
    )
    assert "BroadcastHashJoin" in plan


def test_theil_sen_windows_bucket_keyed(spark):
    """Both median rank selections ride global_row_number's bucket
    construction — every window spec is __bkt-keyed, never a single-
    partition order over the pair frame."""
    from bigdata_kafka_2_spark.operators.timeseries import (
        theil_sen_trend,
    )

    e = read_table(spark, SF_DIR, "events")
    daily = e.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x")
    ).agg(F.count(F.lit(1)).alias("v"))
    plan = _plan(theil_sen_trend(daily, "x", "v"))
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert specs
    assert all("__bkt" in ln for ln in specs)


def test_mann_whitney_no_single_partition_window(spark):
    """Rank arithmetic rides the range-bucketed prefix sum — no
    global-sort window, no per-row rank materialization."""
    from bigdata_kafka_2_spark.operators.profile import mann_whitney_u

    o = read_table(spark, SF_DIR, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_totalprice"
    )
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_totalprice"
    )
    plan = _plan(mann_whitney_u(a, b, "o_totalprice"))
    # every window is range-bucket-keyed (the 1-row scalar aggregate
    # plans its own bounded SinglePartition reduce, like any scalar
    # agg — that's not a data-sized exchange)
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert specs
    assert all("__bkt" in ln for ln in specs)
    assert "hashpartitioning(__bkt" in plan


def test_gini_no_single_partition_window(spark):
    from bigdata_kafka_2_spark.operators.profile import gini_concentration

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(gini_concentration(o, "o_custkey", "o_totalprice"))
    assert "hashpartitioning(__bkt" in plan
    assert "Window" in plan  # per-bucket window, not global


def test_kaplan_meier_no_single_partition_window(spark):
    from bigdata_kafka_2_spark.operators.timeseries import kaplan_meier

    o = read_table(spark, SF_DIR, "orders")
    subj = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("duration"),
        F.lit(1).alias("event"),
    )
    plan = _plan(kaplan_meier(subj))
    assert "hashpartitioning(__bkt" in plan


def test_adamic_adar_no_cartesian(spark):
    """Wedges come from an equi-join on the shared center and the
    top-k is a TakeOrdered, never a cartesian or a global sort."""
    from bigdata_kafka_2_spark.operators.graph import adamic_adar_links

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4)], "a long, b long"
    )
    plan = _plan(adamic_adar_links(edges, top_k=5))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rake_keyphrases_plan_shape(spark):
    """Phrase windows are document-keyed (never a global sort) and
    the top-k is a TakeOrdered."""
    from bigdata_kafka_2_spark.operators.text import rake_keyphrases

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(rake_keyphrases(d, top_k=10))
    assert "Exchange SinglePartition" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(spark):
    """A-ES sampling plans as TakeOrderedAndProject — per-partition
    heaps of k, no global sort."""
    from bigdata_kafka_2_spark.operators.sampling import weighted_sample

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(weighted_sample(d, "n_chars", 10, "doc_id"))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_autocorrelation_no_single_partition(spark):
    from bigdata_kafka_2_spark.operators.timeseries import autocorrelation

    e = read_table(spark, SF_DIR, "events")
    daily = e.groupBy(F.to_date("ts").alias("x")).agg(
        F.count(F.lit(1)).alias("v")
    )
    plan = _plan(autocorrelation(daily, "x", "v", 3))
    assert "CartesianProduct" not in plan


def test_global_prefix_max_matches_naive_and_buckets(spark):
    """Exclusive running max equals the naive global-window answer and
    plans with bucket-keyed windows only."""
    import pyspark.sql.functions as F2

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(500)], "i long, v long"
    )
    out = R.global_prefix_max(df, ["i"], "v")
    got = {r.i: r.max_before for r in out.collect()}
    naive = {
        r.i: r.want
        for r in df.withColumn(
            "want",
            F2.max("v").over(
                Window.orderBy("i").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        ).collect()
    }
    assert got == naive
    plan = _plan(out)
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert specs and all("__bkt" in ln for ln in specs)


def test_global_prefix_sum_decimal_scale9_exact(spark):
    """r13 regression (caught by the sf0.01 vanilla-session verify of
    q255): Spark's DECIMAL(38,s)+DECIMAL(38,s) addition reduces the
    scale to max(38-intDigits, min(s,6)) under allowPrecisionLoss, so
    scale-9/12 prefix sums silently lost their last digit (HALF_UP) in
    the cum+off addition. The operator now adds at precision 37; the
    running sum must match exact Decimal arithmetic digit-for-digit."""
    import decimal

    from bigdata_kafka_2_spark.operators.relational import (
        global_prefix_sum,
    )

    rows = [(i, f"0.00066666{i % 10}") for i in range(10)]
    df = spark.createDataFrame(rows, "t long, w string").select(
        "t", F.col("w").cast("decimal(38,9)").alias("w")
    )
    out = (
        global_prefix_sum(df, ["t"], "w", "c", sum_type="decimal(38,9)")
        .orderBy("t")
        .collect()
    )
    acc = decimal.Decimal(0)
    for r in out:
        assert decimal.Decimal(str(r.c)) == acc, (r.t, r.c, acc)
        acc += decimal.Decimal(str(r.w))
    # scale 12 as well (the NA variance path)
    df12 = spark.createDataFrame(rows, "t long, w string").select(
        "t", (F.col("w").cast("decimal(38,12)") / 1000).alias("w")
    )
    out12 = (
        global_prefix_sum(
            df12, ["t"], "w", "c", sum_type="decimal(38,12)"
        )
        .orderBy("t")
        .collect()
    )
    acc = decimal.Decimal(0)
    for r in out12:
        assert decimal.Decimal(str(r.c)) == acc
        acc += decimal.Decimal(str(r.w))


def test_weighted_kappa_single_partial_aggregate(spark):
    """Quadratic weighted kappa is ONE map-side-combined aggregate —
    no k x k marginal join, no cartesian anywhere."""
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        cohens_kappa_weighted,
    )

    d = read_table(spark, SF_DIR, "documents")
    rated = d.select(
        F.least(F.lit(4), F.floor(F.length("text") / F.lit(120)))
        .alias("ra"),
        F.least(
            F.lit(4),
            F.floor(
                F.size(F.split(F.trim(F.col("text")), r"\s+"))
                / F.lit(20)
            ),
        ).alias("rb"),
    )
    plan = _plan(cohens_kappa_weighted(rated, "ra", "rb"))
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()


def test_ratio_delta_ci_unit_then_arm_aggregate(spark):
    """Delta-method CI aggregates to the unit FIRST (map-side
    combine), then to |arms| rows — two hash aggregates, no window,
    no cartesian."""
    from bigdata_kafka_2_spark.operators.profile import (
        ratio_metric_delta_ci,
    )

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(
        ratio_metric_delta_ci(
            o, "o_orderpriority", "o_custkey", "o_totalprice",
            F.lit(1.0),
        )
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.lower().count("hashaggregate") >= 2


def test_trimmed_mean_bucketed_prefix_no_global_sort(spark):
    """Trimmed/winsorized selection rides the range-bucketed prefix
    sum over the DISTINCT-value table (checkpointed, so the bucket
    exchange lives in the PREFIX plan, not the downstream one — the
    lint's documented LogicalRDD blind spot); downstream is one
    map-side-combined aggregate whose only nested-loop join is the
    broadcast 1-row totals scalar — never a global sort or a
    data-sized cartesian."""
    from bigdata_kafka_2_spark.operators.profile import (
        trimmed_winsorized_mean,
    )
    from bigdata_kafka_2_spark.operators.relational import (
        global_prefix_sum,
    )

    o = read_table(spark, SF_DIR, "orders")
    cents = (
        F.round(F.col("o_totalprice").cast("double"), 2)
        .cast("decimal(18,2)") * 100
    ).cast("long")
    g = o.groupBy(cents.alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    prefix_plan = _plan(global_prefix_sum(g, "__v", "__c", "__b"))
    assert "hashpartitioning(__bkt" in prefix_plan
    plan = _plan(trimmed_winsorized_mean(o, "o_totalprice", 0.1))
    assert "CartesianProduct" not in plan
    assert "Sort " not in plan
    assert "partial_sum" in plan


def test_gini_coefficient_bucketed_prefix(spark):
    from bigdata_kafka_2_spark.operators.profile import (
        gini_coefficient,
    )

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(gini_coefficient(o, "o_totalprice"))
    assert "hashpartitioning(__bkt" in plan
    assert "CartesianProduct" not in plan


def test_js_divergence_token_join_not_doc_join(spark):
    """JS divergence joins the two TOKEN-COUNT tables (vocab-sized),
    never doc x doc; the only cross join is the broadcast 1-row
    totals scalar."""
    from bigdata_kafka_2_spark.operators.text import (
        js_divergence_tokens,
    )

    d = read_table(spark, SF_DIR, "documents")
    out = js_divergence_tokens(
        d.filter(F.col("lang") == "en"),
        d.filter(F.col("lang") != "en"),
        "text",
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan


def test_source_jaccard_token_keyed_join(spark):
    """The pair join is keyed on the TOKEN (SortMergeJoin/shuffle
    hash on __t), never a source x source cartesian; the size joins
    broadcast."""
    from bigdata_kafka_2_spark.operators.text import (
        source_jaccard_matrix,
    )

    d = read_table(spark, SF_DIR, "documents")
    plan = _plan(source_jaccard_matrix(d, "source", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_theil_index_distinct_value_reduction(spark):
    """Theil's data-sized work ends at the distinct-cents count
    aggregate; the totals are a broadcast 1-row scalar."""
    from bigdata_kafka_2_spark.operators.profile import theil_index

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(theil_index(o, "o_totalprice"))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan  # bounded 1-row scalar


def test_brier_decomposition_two_aggregates_no_window(spark):
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        brier_decomposition,
    )

    o = read_table(spark, SF_DIR, "orders")
    p = F.col("o_totalprice").cast("double")
    base = o.select(
        (p - F.floor(p)).alias("s"),
        (F.col("o_orderstatus") == "F").alias("y"),
    )
    plan = _plan(brier_decomposition(base, "s", "y", 10))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_kendall_tau_cell_reduction_first(spark):
    """The tau-b fact table reduces to the bounded contingency table
    before the (checkpointed) cell-pair triangle join — the executed
    plan's data-sized work is one partial hash aggregate."""
    from bigdata_kafka_2_spark.operators.profile import kendall_tau_b

    li = read_table(spark, SF_DIR, "lineitem")
    plan = _plan(kendall_tau_b(li, "l_quantity", "l_linenumber"))
    assert "CartesianProduct" not in plan
    # pair mass comes from broadcast of the bounded cell table
    assert "BroadcastNestedLoopJoin" in plan


def test_cramers_v_grid_is_marginal_bounded(spark):
    """The chi2 grid builds from the two bounded marginal tables
    (broadcast), never a data-sized cross join."""
    from bigdata_kafka_2_spark.operators.profile import cramers_v

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(cramers_v(o, "o_orderpriority", "o_orderstatus"))
    assert "CartesianProduct" not in plan
    assert plan.lower().count("hashaggregate") >= 4


def test_bartlett_single_fact_aggregate(spark):
    from bigdata_kafka_2_spark.operators.profile import bartlett_test

    o = read_table(spark, SF_DIR, "orders")
    plan = _plan(bartlett_test(o, "o_orderpriority", "o_totalprice"))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "partial" in plan.lower()
