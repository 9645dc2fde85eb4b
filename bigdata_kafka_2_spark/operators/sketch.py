"""Mergeable sketches for corpus-scale approximate statistics.

q36's exact heavy-hitter query (explode → groupBy(term) → top-k) is
already scalable, but its shuffle is keyed on the FULL term vocabulary
— at 100 TB the term-count state is billions of keys. The count-min
sketch (Cormode & Muthukrishnan 2005) replaces that with a fixed
``depth × width`` counter grid: memory is constant, updates are
hash-bucket increments, estimates overcount only (never undercount),
and two sketches over disjoint data merge by cell-wise addition — the
properties that make it the streaming/distributed swap-in the q36
docstring promises.

Spark mapping: a sketch is an ordinary DataFrame ``(row_idx, bucket,
cnt)`` holding only NON-ZERO cells. Updates are one ``posexplode``
(depth rows per term occurrence) + one groupBy on ``(row_idx,
bucket)`` — a shuffle over at most ``depth × width`` keys regardless
of vocabulary size, with map-side partial sums doing almost all the
work. Merging unions the cell frames and re-aggregates; estimation is
a broadcast join of the query terms against ``depth`` cells each.

Everything stays JVM-side (xxhash64 + pmod projections); determinism
comes from the fixed per-row seeds, so sketches built shard-by-shard
equal the sketch of the union (mergeability is property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default grid: eps ≈ e/width ≈ 0.0014·N error at width 2048, with
#: failure probability ≈ e^-depth at depth 4.
DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 2048

#: Bucket hash families. ``xxhash64`` is the production default (one
#: JVM hash per cell, no string materialization). ``md5_15`` exists so
#: the ENTIRE sketch pipeline transcribes to ANSI SQL: the first 15 hex
#: digits of md5(term || ':' || (seed+row)) parsed base-16 (< 2^60, so
#: BIGINT-safe) — Spark `conv(substr(md5(..),1,15),16,10)` ==
#: DuckDB `CAST('0x' || substr(md5(..),1,15) AS BIGINT)`, verified
#: bit-identical incl. non-ASCII in tests. Same pairwise-independence
#: story (md5 bits are as uniform as xxhash for CMS purposes); ~2×
#: slower per cell, which is why it is opt-in for graded queries only.
HASH_FNS = ("xxhash64", "md5_15")


def _bucket(term, row_idx: int, width: int, seed: int, hash_fn: str = "xxhash64"):
    """Bucket of ``term`` in sketch row ``row_idx``, folded to
    [0, width). ``hash_fn`` selects the family (see ``HASH_FNS``);
    ``md5_15`` assumes non-null terms (concat propagates null)."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(term, F.lit(seed + row_idx))
    elif hash_fn == "md5_15":
        h = F.conv(
            F.substring(F.md5(F.concat(term, F.lit(f":{seed + row_idx}"))), 1, 15),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"hash_fn must be one of {HASH_FNS}")
    return F.pmod(h, F.lit(width))


def bucket_sql(term_sql: str, row_idx: int, width: int, seed: int) -> str:
    """The DuckDB expression equal to ``_bucket(.., hash_fn='md5_15')``
    — used by the oracle generators to transcribe sketch queries."""
    return (
        f"(CAST('0x' || substr(md5({term_sql} || ':{seed + row_idx}'), 1, 15)"
        f" AS BIGINT) % {width})"
    )


def count_min_build(
    df: DataFrame,
    term_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 42,
    weight_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build a count-min sketch over ``df[term_col]``: one row per
    non-zero cell, ``(row_idx int, bucket int, cnt long)``.

    ``weight_col`` makes it a weighted sketch (e.g. pre-aggregated
    partial counts); default weight is 1 per input row.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    _bucket(F.col(term_col), i, width, seed, hash_fn)
                    for i in range(depth)
                ]
            )
        ).alias("row_idx", "bucket"),
        w.alias("__w"),
    )
    return cells.groupBy("row_idx", "bucket").agg(F.sum("__w").alias("cnt"))


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width, seed) over
    disjoint (or overlapping — counts add) data: cell-wise addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-estimate counts for ``terms[term_col]``: est_cnt =
    min over rows of the term's cell — the classic CMS upper-bound
    estimate (≥ true count always; = for terms with no collisions).

    The sketch side is at most depth×width cells → broadcast; each
    term probes ``depth`` cells via an equi-join on (row_idx, bucket).
    A missing cell means zero occurrences in that row → estimate 0.
    """
    probes = terms.select(
        F.col(term_col),
        F.posexplode(
            F.array(
                *[
                    _bucket(F.col(term_col), i, width, seed, hash_fn)
                    for i in range(depth)
                ]
            )
        ).alias("row_idx", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), on=["row_idx", "bucket"], how="left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


def count_min_topk(
    df: DataFrame,
    term_col: str,
    k: int = 10,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: int = 42,
    candidate_fraction: float | None = None,
    candidate_seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate heavy hitters: (term, est_cnt), top-k by CMS
    estimate — the 100 TB swap-in for q36's exact form.

    Heavy hitters must still be NAMED (a sketch alone cannot enumerate
    keys), so candidates come from a uniform row sample
    (``candidate_fraction``; None = all distinct terms, exact-candidate
    mode). A true top-k term at frequency f appears in an n-row sample
    w.p. 1-(1-f)^n — heavy hitters are precisely the terms a small
    sample cannot miss. Ties broken on term for determinism.
    """
    cand_src = (
        df.sample(fraction=candidate_fraction, seed=candidate_seed)
        if candidate_fraction is not None
        else df
    )
    candidates = cand_src.select(term_col).distinct()
    sketch = count_min_build(df, term_col, depth, width, seed, hash_fn=hash_fn)
    est = count_min_estimate(
        sketch, candidates, term_col, depth, width, seed, hash_fn=hash_fn
    )
    return est.orderBy(
        F.col("est_cnt").desc(), F.col(term_col).asc()
    ).limit(k)


# --- KMV distinct-count sketch ------------------------------------------

#: Hash space of the ``md5_15`` family: 16^15 = 2^60. Exactly
#: representable as a double (a power of two), which the estimator
#: relies on for cross-engine bit-identical arithmetic.
KMV_M = 16**15


def _kmv_hash(value, seed: int, hash_fn: str):
    """Hash of ``value`` for the KMV sketch. ``md5_15`` (the
    SQL-transcribable family, [0, 2^60)) or ``xxhash64`` (production:
    one JVM hash, no string materialization, [0, 2^63) via abs-mod)."""
    if hash_fn == "md5_15":
        return F.conv(
            F.substring(
                F.md5(F.concat(value.cast("string"), F.lit(f":{seed}"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(value, F.lit(seed)), F.lit(KMV_M))
    raise ValueError(f"hash_fn must be one of {HASH_FNS}")


def kmv_candidates(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    seed: int = 7,
    hash_fn: str = "md5_15",
) -> DataFrame:
    """Per-partition KMV candidate sets: ``(group, h)`` — each input
    partition's ≤ k smallest DISTINCT value hashes per group. The
    bounded-state build half of the sketch: any hash among a group's
    GLOBAL k smallest is necessarily among its partition's k smallest
    (fewer than k distinct hashes sort below it anywhere), so the
    union of partition candidates is a guaranteed superset of the
    global bottom-k — :func:`kmv_estimate` finalizes exactly.

    Plan shape: a row-local hash projection, then an Arrow-batched
    ``mapInPandas`` that folds each partition into a ≤ groups×k
    candidate frame (the only state, independent of partition size) —
    the shuffle that follows carries ≤ partitions×groups×k rows
    instead of the full distinct-value set. This is the sketch
    property that matters at 100 TB: per-shard build, tiny mergeable
    state, no vocabulary-sized exchange (q36's exact distinct shuffle
    is what this replaces).
    """
    hashed = df.select(
        F.col(group_col).alias("g"),
        _kmv_hash(F.col(value_col), seed, hash_fn).alias("h"),
    )

    def fold(batches):
        import pandas as pd

        state = None
        for pdf in batches:
            both = pdf if state is None else pd.concat((state, pdf))
            both = both.drop_duplicates()
            both = both.sort_values(["g", "h"], kind="mergesort")
            state = both.groupby("g", sort=False).head(k)
        if state is not None:
            yield state

    # the g field carries the caller's group type verbatim — a
    # hard-coded string type would hit an Arrow type mismatch the
    # first time someone groups by an int key
    out_schema = T.StructType(
        [
            T.StructField("g", df.schema[group_col].dataType),
            T.StructField("h", T.LongType()),
        ]
    )
    return hashed.mapInPandas(fold, out_schema).toDF(group_col, "h")


def kmv_merge(*candidate_sets: DataFrame) -> DataFrame:
    """Union KMV candidate frames built over disjoint shards — the
    merged frame estimates the UNION's cardinality (hash sets union;
    duplicates collapse in :func:`kmv_estimate`'s distinct)."""
    out = candidate_sets[0]
    for c in candidate_sets[1:]:
        out = out.unionByName(c)
    return out


def kmv_estimate(
    candidates: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Finalize a KMV sketch: ``(group, est_distinct)``. With ``h_k``
    the k-th smallest distinct hash in a group, the KMV estimator
    (Bar-Yossef et al. 2002) is ``(k-1) · M / h_k``; a group with
    fewer than k distinct hashes is counted exactly (its candidate
    set IS its value set). Arithmetic is ``(k-1) · (M / h_k)`` in
    doubles with M = 2^60 exactly representable — the identical IEEE
    sequence in Spark and ANSI SQL, so estimates hash-match the
    oracle bit-for-bit.

    Plan shape: distinct over the candidate rows (≤ partitions×k per
    group), one per-group rank window over that bounded set, one
    aggregate. Nothing here scales with data volume — only with
    partition count.
    """
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = candidates.select(group_col, "h").distinct().withColumn(
        "__r", F.row_number().over(w)
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.max(F.when(F.col("__r") == k, F.col("h"))).alias("__hk"),
            F.count(F.lit(1)).alias("__nd"),
        )
        .select(
            group_col,
            F.when(F.col("__nd") < k, F.col("__nd"))
            .otherwise(
                F.floor(
                    F.lit(float(k - 1))
                    * (F.lit(float(KMV_M)) / F.col("__hk"))
                )
            )
            .cast("long")
            .alias("est_distinct"),
        )
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    seed: int = 7,
    hash_fn: str = "md5_15",
) -> DataFrame:
    """End-to-end KMV distinct-count estimate per group — build +
    finalize (see :func:`kmv_candidates` / :func:`kmv_estimate`).
    Standard error ≈ 1/√(k−2) (~13% at k=64; raise k for precision).
    The reference has no approximate-distinct machinery at all; this
    is the mergeable at-scale counterpart to the exact
    ``count_distinct`` family (q18)."""
    return kmv_estimate(
        kmv_candidates(df, value_col, group_col, k, seed, hash_fn),
        group_col,
        k,
    )


# --- Mergeable weighted-sample quantile sketch ------------------------


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 64,
    n_blocks: int = 32,
) -> DataFrame:
    """Per-group weighted rank samples ``(group, value, w)`` — the
    build half of a mergeable quantile sketch (the at-scale companion
    to the exact interpolated percentiles q23/q108 use: exact
    percentiles shuffle every value to its group; this keeps
    ``n_blocks × k`` rows per group no matter how many values).

    Construction is DETERMINISTIC and integer-exact, so the whole
    sketch is SQL-transcribable and hash-checkable — no randomized
    compaction (the place classic KLL gives up determinism):

    1. rows land in ``n_blocks`` content-keyed blocks
       (``id mod n_blocks`` — partitioning-invariant by construction);
    2. within each (group, block), rank by ``(value, id)`` (a
       block-keyed window — state bounded by the block, never the
       group);
    3. keep the elements at boundary ranks ``b_i = (i·n) div k``
       (i = 1..k), each weighted by ``b_i − b_{i−1}`` — integer
       weights that sum to EXACTLY n, so downstream rank targets are
       exact. Blocks smaller than k keep every element at weight 1
       (the boundary diffs collapse to a 0/1 indicator).

    Rank-error guarantee (property-tested): attributing positions
    ``b_{i−1}+1..b_i`` to the boundary element displaces any rank by
    at most ``n_b/k`` per block, ≤ N/k per group overall.

    Merging sketches built over DISJOINT datasets is sample-set union
    (:func:`quantile_sketch_merge`) with additive error — the
    weighted-sample mergeability that lets 1000 executors sketch
    their shards and a coordinator answer global quantiles. (Unlike
    KMV, re-sketching a different SPLIT of the same rows is not
    bit-identical — blocks must be sketched whole; the content-keyed
    block hash makes that a repartition, not a correctness hazard.)
    """
    base = df.select(
        F.col(group_col).alias("g"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).alias("__blk"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("__id"),
    )
    ranked = base.withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy("g", "__blk").orderBy("v", "__id")
        ),
    )
    sizes = base.groupBy("g", "__blk").agg(F.count(F.lit(1)).alias("__n"))
    bounds = (
        sizes.select(
            "g",
            "__blk",
            "__n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("__i"),
        )
        .select(
            "g",
            "__blk",
            F.expr(f"(__i * __n) div {k}").alias("__r"),
            (
                F.expr(f"(__i * __n) div {k}")
                - F.expr(f"((__i - 1) * __n) div {k}")
            ).alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    return (
        ranked.join(bounds, on=["g", "__blk", "__r"])
        .groupBy(F.col("g").alias(group_col), F.col("v").alias(value_col))
        .agg(F.sum("w").cast("long").alias("w"))
    )


def quantile_sketch_merge(*sketches: DataFrame) -> DataFrame:
    """Union weighted-sample frames built over disjoint datasets;
    duplicate values re-collapse in the estimate's tie-merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out


def quantile_sketch_estimate(
    sketch: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Answer p50/p90/p99 from a quantile sketch: ``(group, n, p50,
    p90, p99)`` where each estimate is the smallest sampled value
    whose cumulative weight reaches ``ceil(q·N)`` — N is EXACT
    because block weights sum to block sizes.

    All arithmetic is integer (ceil targets via div); the value
    column is only compared and min'd, never operated on — so
    estimates are bit-identical cross-engine with no float-rounding
    protocol. The cumulative window is per group over the sketch's
    ≤ n_blocks×k collapsed values — bounded state, asserted in plan
    tests as a group-partitioned (never single-partition) window.
    """
    # build() frames already collapse value ties; merged unions may
    # reintroduce them, so collapse defensively (also kills any
    # cross-engine tie-order ambiguity in the cumulative window).
    g = group_col
    s = (
        sketch.groupBy(g, value_col)
        .agg(F.sum("w").cast("long").alias("w"))
    )
    cum = s.withColumn(
        "__cw",
        F.sum("w").over(
            Window.partitionBy(g)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = s.groupBy(g).agg(F.sum("w").cast("long").alias("n"))
    return (
        cum.join(totals, on=g)
        .groupBy(g, "n")
        .agg(
            F.min(
                F.when(F.col("__cw") >= F.expr("(n + 1) div 2"), F.col(value_col))
            ).alias("p50"),
            F.min(
                F.when(F.col("__cw") >= F.expr("(9 * n + 9) div 10"), F.col(value_col))
            ).alias("p90"),
            F.min(
                F.when(F.col("__cw") >= F.expr("(99 * n + 99) div 100"), F.col(value_col))
            ).alias("p99"),
        )
    )


def domain_minhash_similarity(
    documents: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Pairwise DOMAIN similarity matrix via mergeable MinHash
    sketches: ``(domain_a, domain_b, n_match, jaccard_est)`` for every
    unordered domain pair, where ``jaccard_est = n_match/num_hashes``
    estimates the Jaccard similarity of the two domains' k-token
    shingle SETS. The corpus-level complement of the per-document
    dedup family: mixture design and contamination triage start from
    "how much does source A overlap source B" long before any
    per-document pair is worth mining.

    Sketch shape (the reason this scales): each domain's signature is
    ``num_hashes`` per-seed MINIMA — min is associative/commutative,
    so the groupBy computes per-partition partial minima map-side and
    shuffles only |domains| partial rows per partition, NEVER the
    shingles. The pairwise stage runs on |domains| wide rows (a
    broadcast nested-loop over the tiny signature table); at 100 TB
    the only data-scale stages are the shingle scan and the distinct,
    both shingle-keyed and linear.

    Portability: hashes are the sketch family's ``md5_15`` (first 15
    hex digits of ``md5(shingle || ':' || seed)`` parsed base-16 —
    bit-identical in DuckDB, so the whole matrix is hash-checkable);
    shingle generation reuses :func:`operators.dedup.shingles` (the
    q41-transcribed convention, including short-document handling).
    ``jaccard_est`` is ``n/num_hashes`` — exact in binary for the
    default 32, so no rounding discipline is needed.
    """
    from bigdata_kafka_2_spark.operators.dedup import shingles

    sh = shingles(documents, text_col=text_col, id_col=domain_col, k=k)
    hash_cols = [
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("shingle"), F.lit(f":{j}"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias(f"__h{j}")
        for j in range(num_hashes)
    ]
    sig = (
        sh.select(F.col(domain_col), *hash_cols)
        .groupBy(domain_col)
        .agg(*[F.min(f"__h{j}").alias(f"__h{j}") for j in range(num_hashes)])
        .select(
            F.col(domain_col),
            F.array(*[f"__h{j}" for j in range(num_hashes)]).alias("__sig"),
        )
    )
    a = sig.select(
        F.col(domain_col).alias("domain_a"), F.col("__sig").alias("__sa")
    )
    b = sig.select(
        F.col(domain_col).alias("domain_b"), F.col("__sig").alias("__sb")
    )
    n_match = F.size(
        F.filter(
            F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda m: m
        )
    )
    return (
        a.join(F.broadcast(b), F.col("domain_a") < F.col("domain_b"))
        .select(
            "domain_a",
            "domain_b",
            n_match.cast("long").alias("n_match"),
            (n_match.cast("double") / F.lit(float(num_hashes))).alias(
                "jaccard_est"
            ),
        )
    )


def kmv_overlap(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
    seed: int = 7,
    hash_fn: str = "md5_15",
) -> DataFrame:
    """Set-algebra on KMV sketches: distinct-count estimates for two
    groups' value sets, their UNION, and (by inclusion-exclusion)
    their INTERSECTION — one row ``(group_a, group_b, est_a, est_b,
    est_union, est_intersection)`` — computed from the sketches
    alone, never from the exact sets.

    The union estimate is EXACTLY a KMV sketch of the union: the k
    smallest distinct hashes of A ∪ B are a subset of
    candidates(A) ∪ candidates(B), so merging candidate frames and
    re-finalizing is the union sketch (the mergeability that makes
    KMV shard-parallel also makes it an algebra). Intersection =
    max(0, est_a + est_b − est_union) — inclusion-exclusion over
    deterministic estimates, so the result is itself deterministic
    and SQL-transcribable. At 100 TB this answers "how many users do
    these two segments share" from two ≤k-row sketch tables, with no
    join over the raw sets.

    All inputs flow through ONE :func:`kmv_candidates` build over the
    two groups (bounded per-partition state); the three finalizes run
    over ≤ partitions×k candidate rows each; the single-row combine
    is a broadcast cross join of 1-row aggregates.
    """
    two = df.filter(F.col(group_col).isin([group_a, group_b]))
    cand = kmv_candidates(two, value_col, group_col, k, seed, hash_fn)
    est = kmv_estimate(cand, group_col, k)
    est_u = kmv_estimate(
        cand.select(F.lit("__union").alias(group_col), "h"),
        group_col,
        k,
    )
    ea = est.filter(F.col(group_col) == group_a).select(
        F.col("est_distinct").alias("est_a")
    )
    eb = est.filter(F.col(group_col) == group_b).select(
        F.col("est_distinct").alias("est_b")
    )
    eu = est_u.select(F.col("est_distinct").alias("est_union"))
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .select(
            F.lit(group_a).alias("group_a"),
            F.lit(group_b).alias("group_b"),
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ).alias("est_intersection"),
        )
    )
