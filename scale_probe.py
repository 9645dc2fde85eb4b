"""Scale probe: does the headline plan set scale ~linearly with data?

Generates a FACTOR× replica of ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1 → synthetic "sf1") under ``$SPARK_GRAFT_SCALE_DIR``
(default /tmp/spark_graft_scale), runs the bench HEADLINE queries at
both scales in one session, and prints ONE JSON line with per-query
times and large/small ratios. r3 verdict item 5: the 100 TB design
claim should rest on a measured scaling exponent, not plan shape alone.

Replication is PROPORTIONAL — each copy reproduces the original's
internal structure and copies don't interact:

- facts (customer/orders/lineitem): ids shifted by a per-copy offset so
  intra-copy joins match and copies never join each other. Dims
  (region/nation/part/supplier) stay fixed, as in TPC-H's fixed small
  dims — fact-per-dim density grows, which is the scale direction that
  stresses join plans. ``c_name`` is regenerated from the SHIFTED key
  (it derives from the key in the source data), so name-keyed
  operators (q118's entity blocking) see disjoint per-copy name
  spaces with identical within-copy structure.
- documents: doc_id shifted AND text passed through a per-copy letter
  SUBSTITUTION CIPHER (``translate`` over a-z, copy 0 = identity):
  token/char counts, chars-per-token, and type-token-ratio are
  IDENTICAL per copy (the cipher is a bijection on tokens), so
  quality-filter keep rates replicate exactly, while cross-copy
  token/shingle overlap collapses to ~0 (only all-non-letter tokens
  survive the cipher unchanged) — dedup pair counts scale ×FACTOR,
  not ×FACTOR². (r6 used a per-token tag prefix, which inflated
  chars-per-token and made the quality filter drop most replica
  docs — q66's large run measured artificially light.)
- embeddings: doc_id shifted and each vector multiplied element-wise by
  a per-copy random ±1 sign pattern: within-copy cosine structure is
  EXACTLY preserved (cos(s⊙x, s⊙y) = cos(x, y)), cross-copy similarity
  collapses to ~0 — the ANN/near-dup workload scales without clone
  explosions.
- events: event_id/user_id shifted; timestamps kept, so per-window and
  per-user densities grow ×FACTOR.

Interpretation: with 32 local cores and sub-second small-scale times, a
ratio well UNDER the factor means fixed overhead still dominates; a
ratio ABOVE ~1.3× the factor flags a super-linear plan (quadratic pair
growth, broadcast flipping to shuffle, spill) and is reported in
``superlinear``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from bigdata_kafka_2_spark import get_spark
from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import load_extended
from bench import HEADLINE

#: id-like columns shifted per copy, per table (consistent across
#: tables so intra-copy joins keep matching).
_SHIFT = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
}
_FIXED_DIMS = ("region", "nation", "part", "supplier")
_OFFSET = 100_000_000


def _sign_pattern(dim: int, copy: int) -> list[int]:
    """Deterministic ±1 pattern per copy (copy 0 = identity)."""
    if copy == 0:
        return [1] * dim
    state = copy * 2_654_435_761 % (1 << 32)
    out = []
    for _ in range(dim):
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        out.append(1 if (state >> 16) & 1 else -1)
    return out


def generate(spark, src: str, dst: str, factor: int) -> None:
    """Write the factor× replica (idempotent: skips if marker matches)."""
    # v3: c_name regenerated from the shifted key (marker version
    # forces regen when the replication scheme changes)
    marker = os.path.join(
        dst, f".complete_v3_{factor}_{os.path.basename(src.rstrip('/'))}"
    )
    if os.path.exists(marker):
        return
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    for name in _FIXED_DIMS:
        df = read_table(spark, src, name)
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
    for name, id_cols in _SHIFT.items():
        df = read_table(spark, src, name)
        copies = []
        if name == "embeddings":
            dim = len(df.select("embedding").first()[0])
        for c in range(factor):
            cp = df
            for col in id_cols:
                cp = cp.withColumn(col, F.col(col) + F.lit(c * _OFFSET))
            if name == "customer":
                # c_name derives from c_custkey in the source data
                # ("Customer#%09d"); regenerate it from the SHIFTED key
                # so each copy keeps the exact within-copy name<->key
                # structure while copies stay disjoint. Copying names
                # verbatim merged all 10 copies of a name into one
                # entity-matching block (q118), turning the blocked
                # join quadratic across copies — a replication
                # artifact, not a plan property.
                cp = cp.withColumn(
                    "c_name",
                    F.format_string("Customer#%09d", F.col("c_custkey")),
                )
            elif name == "documents":
                # per-copy substitution cipher: length-preserving, so
                # quality stats replicate; cross-copy overlap ~0
                alpha = "abcdefghijklmnopqrstuvwxyz"
                rot = alpha[c % 26:] + alpha[: c % 26]
                cp = cp.withColumn(
                    "text",
                    F.translate(
                        "text", alpha + alpha.upper(), rot + rot.upper()
                    ),
                )
            elif name == "embeddings":
                signs = F.array(
                    *[F.lit(float(s)) for s in _sign_pattern(dim, c)]
                )
                cp = cp.withColumn(
                    "embedding",
                    F.zip_with("embedding", signs, lambda x, s: x * s),
                )
            copies.append(cp)
        out = copies[0]
        for cp in copies[1:]:
            out = out.unionByName(cp)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale")
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    spark = get_spark("scale_probe")
    t0 = time.perf_counter()
    generate(spark, src, dst, factor)
    gen_s = round(time.perf_counter() - t0, 1)
    registry = load_extended()
    # optional subset (comma-separated names): deep-probe a few watched
    # queries at a HIGHER factor than the full-headline 10x run — at
    # 10x the sub-second small side is mostly fixed overhead, which
    # inflates ratios; a 30x subset run amortizes it and shows the
    # actual growth exponent.
    subset = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
    names = (
        [n for n in subset.split(",") if n] if subset else list(HEADLINE)
    )
    result: dict[str, dict[str, float]] = {}
    for name in names:
        q = registry[name]
        row: dict[str, float] = {}
        for tag, sf_dir in (("small", src), ("large", dst)):
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                # noop sink = full materialization (count() lets
                # Catalyst prune projection-only work; see bench.py).
                q.spark_fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.perf_counter() - t0)
            row[tag] = round(min(runs), 3)
        row["ratio"] = round(row["large"] / max(row["small"], 1e-3), 2)
        result[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    # (r6 carried a separate "q53_auto_planes" sideline here because the
    # graded q53 pinned its plane grid for oracle transcription; the
    # graded instance now auto-sizes planes from the dataset's row
    # count — graded plan ≡ production plan — so HEADLINE's q53 row IS
    # the scale configuration.)
    superlinear = sorted(
        n for n, r in result.items() if r["ratio"] > 1.3 * factor
    )
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "factor": factor,
                "generation_sec": gen_s,
                "small_total_sec": round(sum(r["small"] for r in result.values()), 3),
                "large_total_sec": round(sum(r["large"] for r in result.values()), 3),
                "queries": result,
                "superlinear": superlinear,
                "runs_per_query": n_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
