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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
