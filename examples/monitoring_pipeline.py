"""End-to-end data-quality MONITORING pipeline — the production-ops
counterpart of ``examples/curation_pipeline.py``, runnable as one
script:

    python examples/monitoring_pipeline.py [--sf-dir /root/testdata/sf0.001]

A training-data platform doesn't just curate once; it watches every
refresh. This script strings the engine's drift/integrity/monitoring
families into the loop an on-call data engineer actually runs when a
new snapshot lands (all distributed; collected outputs are bounded
summaries):

1. INTEGRITY   — order/partitioning-independent dataset digest of the
                 new snapshot (operators/incremental.dataset_digest):
                 a dropped and a duplicated row cancel in a count but
                 cannot cancel in the digest.
2. DRIFT       — reference vs current value distributions: PSI over
                 frozen reference buckets (profile.psi_drift), the
                 binning-free KS statistic (profile.ks_test), and the
                 rank-based Mann-Whitney direction+magnitude
                 (profile.mann_whitney_u).
3. CHANGEPOINT — WHERE the daily level shifted, no split point
                 assumed (timeseries.cusum_changepoint), plus the
                 classical and robust trend fits over daily activity
                 (timeseries.ols_trend, timeseries.theil_sen_trend)
                 and the ACF that justifies any assumed seasonality
                 (timeseries.autocorrelation).
4. LATENESS    — the watermark-tuning table: how late events arrive
                 vs the arrival-order high-water mark
                 (relational.global_prefix_max — feeds the
                 withWatermark() delay choice for the streaming jobs).
5. CONCENTRATION — is the refresh suddenly dominated by a few
                 sources? Gini + top-share audit
                 (profile.gini_concentration) and leave-one-group-out
                 ablation deltas (profile.loo_contributions).

Each stage prints a compact summary; the script exits non-zero if the
drift gates trip (PSI > 0.25 or |z| > 4), which is how a scheduler
turns this into a blocking check.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from bigdata_kafka_2_spark import get_spark
from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators.incremental import dataset_digest
from bigdata_kafka_2_spark.operators.profile import (
    gini_concentration,
    ks_test,
    loo_contributions,
    mann_whitney_u,
    psi_drift,
)
from bigdata_kafka_2_spark.operators.relational import global_prefix_max
from bigdata_kafka_2_spark.operators.timeseries import (
    autocorrelation,
    cusum_changepoint,
    ols_trend,
    theil_sen_trend,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("monitoring_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    events = read_table(spark, args.sf_dir, "events")
    orders = read_table(spark, args.sf_dir, "orders")
    split = F.lit("2024-01-16").cast("timestamp")
    ref = events.filter(F.col("ts") < split)
    cur = events.filter(F.col("ts") >= split)

    # 1. INTEGRITY — content digest of the refresh
    dig = dataset_digest(
        events, ["event_id", "event_type", "value"]
    ).collect()[0]
    print(f"[integrity] rows={dig.n_rows} digest={dig.digest}")

    # 2. DRIFT — three two-sample reads of the same split
    psi = psi_drift(
        ref.select("value"), cur.select("value"), "value"
    ).collect()[0]
    ks = ks_test(
        ref.select("value"), cur.select("value"), "value"
    ).collect()[0]
    mw = mann_whitney_u(
        ref.select("value"), cur.select("value"), "value"
    ).collect()[0]
    print(
        f"[drift] psi={psi.psi} ks_d={ks.ks_d} "
        f"mw_z={mw.z} cles={mw.cles_a}"
    )

    # 3. CHANGEPOINT + trend — where and how the daily level moves
    daily = events.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x")
    ).agg(F.count(F.lit(1)).alias("v"))
    cp = cusum_changepoint(daily, "x", "v").collect()[0]
    ts_fit = theil_sen_trend(daily, "x", "v").collect()[0]
    ols = ols_trend(
        daily.withColumn("g", F.lit("all")), ["g"], "x", "v"
    ).collect()[0]
    acf = {
        r.lag: r.acf
        for r in autocorrelation(daily, "x", "v", max_lag=7).collect()
    }
    print(
        f"[changepoint] day={cp[1]} max_cusum={cp.max_cusum} | "
        f"theil_sen={ts_fit.slope} ols={ols.slope} r2={ols.r2} | "
        f"acf7={acf.get(7)}"
    )

    # 4. LATENESS — the watermark-tuning profile
    arr = events.select("event_id", F.unix_micros("ts").alias("us"))
    pm = global_prefix_max(arr, ["event_id"], "us", out_col="hw")
    late = pm.select(
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.col("hw") - F.col("us"), F.lit(0).cast("long")),
        ).alias("l")
    )
    q95 = late.approxQuantile("l", [0.95], 0.01)[0]
    print(f"[lateness] p95_late={q95 / 1e6:.1f}s (watermark candidate)")

    # 5. CONCENTRATION — source domination audit
    gini = gini_concentration(orders, "o_custkey", "o_totalprice").collect()[0]
    loo = (
        loo_contributions(events, ["event_type"], "value")
        .orderBy(F.abs(F.col("delta")).desc())
        .collect()
    )
    worst = loo[0]
    print(
        f"[concentration] gini={gini.gini} top1%={gini.top1pct_share} | "
        f"largest LOO delta: {worst.event_type} {worst.delta}"
    )

    tripped = (psi.psi is not None and psi.psi > 0.25) or (
        mw.z is not None and abs(mw.z) > 4.0
    )
    print(f"[gate] {'TRIPPED' if tripped else 'clean'}")
    spark.stop()
    return 1 if tripped else 0


if __name__ == "__main__":
    sys.exit(main())
