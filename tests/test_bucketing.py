"""Bucketed-table co-location: an equi-join of two tables bucketed on
the join key must plan with NO shuffle exchange — the write-once,
join-many amortization used for repeated fact-fact joins at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_bucketed, read_table, write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    l = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(l, "t_lineitem_b", "l_orderkey", 8, sort_by="l_orderkey")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_orders_b",
        "l_orderkey",
        8,
        sort_by="l_orderkey",
    )
    lb = read_bucketed(spark, "t_lineitem_b")
    ob = read_bucketed(spark, "t_orders_b")
    joined = lb.join(ob, on="l_orderkey")

    # at toy scale Catalyst would just broadcast (cheaper than using
    # the buckets); disable broadcast to surface the at-scale plan,
    # where bucketing must remove the shuffle on BOTH sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" in plan

    # and the result matches the plain (shuffled) join
    plain = l.join(
        o, l.l_orderkey == o.o_orderkey
    ).count()
    assert joined.count() == plain


def test_bucketed_aggregate_avoids_shuffle(spark, tmp_path):
    l = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(l, "t_li_agg_b", "l_orderkey", 8)
    lb = read_bucketed(spark, "t_li_agg_b")
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_zorder_write_tightens_both_columns(spark, tmp_path):
    """Z-order layout: every written file covers a narrow range of BOTH
    cluster columns (parquet min/max stays tight for two-dimensional
    skipping), while a one-column sort leaves the other column's
    per-file range at ~full width."""
    import os

    import pyarrow.parquet as pq

    from bigdata_kafka_2_spark.io import write_zordered

    e = read_table(spark, SF_DIR, "events").select("user_id", "value")
    lo_u, hi_u, lo_v, hi_v = e.select(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()

    def avg_ranges(path):
        ru, rv, n = 0.0, 0.0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(path, f), columns=["user_id", "value"])
            u, v = t.column("user_id").to_pylist(), t.column("value").to_pylist()
            if not u:
                continue
            ru += (max(u) - min(u)) / (hi_u - lo_u)
            rv += (max(v) - min(v)) / (hi_v - lo_v)
            n += 1
        return ru / n, rv / n, n

    zdir = str(tmp_path / "zordered")
    write_zordered(e, zdir, ("user_id", "value"), num_files=8)
    zu, zv, zn = avg_ranges(zdir)
    assert zn >= 4  # actually produced a multi-file layout
    # both dimensions tight at once — the z-curve property
    assert zu < 0.6 and zv < 0.6, (zu, zv)

    sdir = str(tmp_path / "sorted_u")
    (
        e.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )
    su, sv, _ = avg_ranges(sdir)
    assert su < 0.3          # the sorted column clusters...
    assert sv > 0.7          # ...but the other column stays near-full-range
    # worst-dimension range is what bounds skipping when predicates can
    # hit either column; the z-curve keeps it strictly tighter
    assert max(zu, zv) < max(su, sv)


def test_compact_parquet_roundtrip(tmp_path, spark):
    from bigdata_kafka_2_spark.io import compact_parquet, read_table

    d = read_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "fragmented")
    # simulate a fragmented ingest: 64 tiny files
    d.repartition(64).write.parquet(path)
    before = sorted(r.doc_id for r in spark.read.parquet(path).collect())

    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1  # everything fits one target file
    after = sorted(r.doc_id for r in spark.read.parquet(path).collect())
    assert after == before  # rows preserved exactly

    # target smaller than total -> splits back into multiple files
    # (stats2["bytes"] is the compacted single-file layout, smaller
    # than the fragmented total because 64 files carry 64 footers)
    stats2 = compact_parquet(
        spark, path, target_file_bytes=max(1, stats["bytes"] // 4)
    )
    assert stats2["files_before"] == 1
    assert stats2["files_after"] >= 2
    again = sorted(r.doc_id for r in spark.read.parquet(path).collect())
    assert again == before


def test_compact_parquet_crash_recovery(tmp_path, spark):
    """r7 advice: a crash between the two swap renames leaves the data
    at the __compact_old name and nothing at path; stale tmp/old dirs
    from a crashed run must not fail every later compaction. Entry-time
    recovery restores the old dir and clears stale state."""
    import os
    import shutil

    from bigdata_kafka_2_spark.io import compact_parquet, read_table

    d = read_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "tbl")
    d.repartition(4).write.parquet(path)
    before = sorted(r.doc_id for r in spark.read.parquet(path).collect())

    # crash between rename(path, old) and rename(tmp, path): no live
    # dir at path, data parked at __compact_old
    os.rename(path, path + "__compact_old")
    # plus a stale tmp left by the same crashed run
    os.makedirs(path + "__compact_tmp/junk")
    stats = compact_parquet(spark, path, target_file_bytes=10**9)
    assert stats["files_after"] == 1
    assert not os.path.exists(path + "__compact_old")
    assert not os.path.exists(path + "__compact_tmp")
    after = sorted(r.doc_id for r in spark.read.parquet(path).collect())
    assert after == before

    # stale dirs WITH a live path: cleaned up, compaction proceeds
    os.makedirs(path + "__compact_old/junk")
    shutil.copytree(path, path + "__compact_tmp", dirs_exist_ok=True)
    compact_parquet(spark, path, target_file_bytes=10**9)
    assert not os.path.exists(path + "__compact_old")
    assert not os.path.exists(path + "__compact_tmp")
    assert sorted(r.doc_id for r in spark.read.parquet(path).collect()) == before
