"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a driver-side count (the result
sets are small aggregates/top-ks; counting forces the whole plan
without the toPandas transfer cost dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time

from bigdata_kafka_2_spark import get_spark
from bigdata_kafka_2_spark.plans import load_all

#: Headline set: flagship aggregation, the heavy joins, windows,
#: event-time windows, text/dedup/similarity extensions. Chosen to cover
#: every operator family while keeping a per-round bench under ~2 min.
HEADLINE = (
    "q01_pricing_summary",
    "q06_join_broadcast_dim",
    "q07_multiway_join_revenue",
    "q11_topk_per_group",
    "q12_running_sum_window",
    "q18_count_distinct",
    "q28_tpch_q3_shipping_priority",
    "q30_token_stats",
    "q36_top_terms",
    "q40_exact_dedup_groups",
    "q42_minhash_lsh_pairs",
    "q50_cosine_topk",
    "q51_cosine_topk_many",
    "q60_tumbling_window",
    "q62_session_window",
    "q63_streaming_tumbling_window",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    registry = load_all()

    # Warm the JVM/session on the smallest table so the first measured
    # query doesn't pay session startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.perf_counter()
        df = q.spark_fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
