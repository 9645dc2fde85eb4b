"""Targeted measurement harness for optimization work (guide §1).

Times a named subset of registry queries with the SAME methodology as
bench.py (noop sink, min-of-N), and additionally reports the number of
Spark JOBS each run launched — on this host the ~0.3-0.5 s/job
scheduler floor dominates multi-stage queries at sf0.1, so job count
is the first thing to shrink. Optionally dumps
``.explain("formatted")`` per query to a directory.

Usage:
    python scripts/measure.py q144_pagerank q153_triangle_counts \
        [--runs 3] [--sf /root/testdata/sf0.1] [--explain plans/r14/X]

This is a developer tool; the driver-facing bench contract lives in
bench.py unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_kafka_2_spark import get_spark  # noqa: E402
from bigdata_kafka_2_spark.plans import load_extended  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--explain", default=None, help="dir for <q>.txt explain dumps")
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps")
    args = ap.parse_args()

    spark = get_spark("measure")
    sc = spark.sparkContext
    registry = load_extended()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    def job_count() -> int:
        tracker = sc._jsc.sc().statusTracker()
        ids = tracker.getJobIdsForGroup(None)
        return max(list(ids) + [-1]) + 1 if ids else 0

    out: dict[str, dict] = {}
    # round-robin passes like bench.py so one noise window can't cover
    # all of a query's runs
    runs: dict[str, list[float]] = {n: [] for n in args.names}
    jobs: dict[str, int] = {}
    for pass_no in range(args.runs):
        for name in args.names:
            q = registry[name]
            sc.setJobDescription(f"measure:{name}")
            j0 = job_count()
            t0 = time.perf_counter()
            df = q.spark_fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs[name].append(dt)
            if pass_no == 0:
                jobs[name] = job_count() - j0
                if args.explain:
                    os.makedirs(args.explain, exist_ok=True)
                    df2 = q.spark_fn(spark, args.sf)
                    with open(
                        os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
                    ) as fh:
                        fh.write(df2._sc._jvm.PythonSQLUtils.explainString(
                            df2._jdf.queryExecution(), "formatted"
                        ))
            sc.setJobDescription(None)
    for name in args.names:
        out[name] = {
            "min": round(min(runs[name]), 3),
            "max": round(max(runs[name]), 3),
            "all": [round(r, 3) for r in runs[name]],
            "jobs_first_run": jobs[name],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
