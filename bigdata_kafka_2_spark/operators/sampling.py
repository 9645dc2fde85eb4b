"""Sampling & split operators for training-data pipelines (charter
extension).

Deterministic-by-construction: every split/sample decision is a pure
function of the row's key (seeded ``xxhash64``), never of partitioning
or row order — re-running on re-partitioned (or re-sharded 100 TB)
data yields byte-identical membership, and adding rows never moves
existing rows between splits (the property naive ``randomSplit``
lacks).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_bucket(key_col: str, seed: int = 42, buckets: int = _BUCKETS):
    """Stable bucket in [0, buckets) from a seeded xxhash64 of the key."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(buckets))


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash range.

    ``fractions`` e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``
    (must sum to ≤ 1; remainder falls into the last split). Membership
    depends only on (key, seed) — stable under re-partitioning,
    appends, and re-runs.
    """
    names = list(fractions)
    bucket = hash_bucket(key_col, seed)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows by hash threshold — a repeatable
    Bernoulli sample (same rows every run, any partitioning)."""
    return df.filter(hash_bucket(key_col, seed) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages in a corpus): each stratum keeps its own hash fraction.

    Unlike ``DataFrame.sampleBy`` this is exactly reproducible across
    partitionings and appends (hash threshold, not RNG-per-partition).
    """
    bucket = hash_bucket(key_col, seed)
    keep = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == stratum) & (bucket < int(frac * _BUCKETS))
        keep = cond if keep is None else keep | cond
    # strata not named in fractions are kept in full
    named = F.col(strata_col).isin(list(fractions))
    return df.filter((~named) | keep)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of size ``k`` — the
    Efraimidis–Spirakis A-ES scheme: each row draws an exponential
    order key ``-ln(u) / w`` (u a hash-derived uniform, w the weight)
    and the ``k`` smallest keys win. Inclusion probability rises with
    weight; the single pass is a ``TakeOrderedAndProject`` (per-
    partition heaps of k), no global sort, no shuffle beyond the final
    k-row merge — the quality-weighted corpus-subsampling primitive
    (sample documents proportionally to a quality score).

    Deterministic for a fixed (key, seed): re-runs and re-partitions
    yield the same sample (the engine's sampling contract). Rows with
    weight <= 0 never win.
    """
    u = (hash_bucket(key_col, seed, _BUCKETS) + 1) / F.lit(
        float(_BUCKETS + 1)
    )  # uniform in (0, 1]
    ekey = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__ekey", ekey)
        .orderBy(F.col("__ekey").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__ekey")
    )
