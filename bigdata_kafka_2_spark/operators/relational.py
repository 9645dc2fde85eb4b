"""Relational operators (SURVEY.md §2.2, §2.3, §2.4, §2.5).

The reference's relational surface is small — projection (P1), coercion
(P2-P4), a conditional column (P5), equality lookup (P6), substring
match (P7/P8), counts (A1/A2), and ``limit`` slices (L1). The engine
re-expresses each as a documented DataFrame transform and fills the
capability-gap table (§2.11: joins, sorts, set ops, windows, distinct,
rollup/cube) with thin, scale-annotated wrappers so the whole surface is
one library.

Scale notes live on each operator: which side broadcasts, where the
shuffle lands, what AQE handles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.functions import contains_term


# --- Filters / projections (P1, P6, P7) ---------------------------------

def point_lookup(df: DataFrame, key_col: str, key) -> DataFrame:
    """Equality point lookup (P6, ``README.md:122-126``).

    ``filter(col == lit)`` pushes to the parquet scan
    (min/max + dictionary pruning); on a partitioned layout it becomes
    partition pruning — O(matching files), not O(table).
    """
    return df.filter(F.col(key_col) == F.lit(key))


def substring_filter(df: DataFrame, text_col: str, term: str) -> DataFrame:
    """Lowercase substring containment filter (P7/P8,
    ``README.md:116-120,92``).

    A `contains` predicate cannot use parquet min/max stats, so this is
    a full scan of ``text_col`` — at 100 TB the scale path is the
    inverted-index variant (tokenize → explode → pre-bucketed term
    join); kept here as the semantic baseline.
    """
    return df.filter(contains_term(text_col, term))


def conditional_label(
    df: DataFrame, out_col: str, condition: Column, if_true=1.0, if_false=0.0
) -> DataFrame:
    """Derived conditional column (P5) — the ``is_high_protein`` pattern
    ``when(col > 20.0, 1.0).otherwise(0.0)``
    (``spark_model_trainer.py:151-153``)."""
    return df.withColumn(
        out_col, F.when(condition, F.lit(if_true)).otherwise(F.lit(if_false))
    )


# --- Aggregations (A1, A2) ----------------------------------------------

def grouped_count(df: DataFrame, *group_cols: str, out_col: str = "n") -> DataFrame:
    """Group-by count (A2, ``spark_model_trainer.py:156``).

    Spark's hash aggregate does the partial (map-side) + final split
    automatically — the property §2.3 notes the reference gets for free.
    """
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(out_col))


# --- Joins (§2.4 — absent in reference, required by harness) ------------

def dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner", broadcast_dim: bool = True
) -> DataFrame:
    """Fact-to-dimension equi-join.

    Small dimension → ``F.broadcast`` to skip the shuffle entirely: the
    fact side streams map-side. This is THE scale decision for
    star-schema joins — a 100 TB fact table must not shuffle to meet a
    KB-scale dimension. AQE would usually discover this, but making it
    explicit keeps the plan stable.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side's key, replicate the
    (small) other side across ``salt_buckets`` salts, join on
    (key, salt).

    A hot key that would pin one reducer now spreads across
    ``salt_buckets`` tasks. AQE's skew-join splitting handles most
    cases automatically (enabled in the session factory); explicit
    salting remains for extreme single-key skew (e.g. the null/default
    key of a 100 TB log table) and for window/aggregate paths AQE does
    not cover. Result equivalence with the plain join is tested.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    replicated_dim = dim.withColumn("__salt", salts)
    out = salted_fact.join(replicated_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — rows of ``left`` with a match in ``right``; never
    duplicates left rows (unlike inner join + distinct)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match in ``right``."""
    return left.join(right, on=on, how="left_anti")


# --- Sorts / limits / top-k (L1, L2) ------------------------------------

def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k via ``orderBy().limit(k)``.

    Spark plans this as TakeOrderedAndProject: each partition keeps a
    k-row heap, the driver merges — no global sort, no full shuffle.
    Callers must pass a total order (tie-break on a key column) for
    deterministic results (the flaw SURVEY §2.5/L1 notes in the
    reference's bare ``limit``).
    """
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per group: ``row_number`` over a partitioned window.

    One shuffle on ``group_cols``; skewed groups are the risk at scale
    (AQE skew handling does not apply to windows) — for pathological
    skew, pre-aggregate or salt. Ties must be broken by the caller's
    ``order_by`` for determinism.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """As-of join (custom operator — Spark has no native one): for each
    left row, attach the latest right row with ``right_ts <= left_ts``.

    Implementation (composition of built-ins, per the preference order
    in SURVEY §4): tag and union both sides, sort by (timestamp, side)
    within each partition group, carry the right side's values forward
    with ``last(..., ignorenulls=True)`` over an unbounded-preceding
    window, keep the left rows. Right rows sort BEFORE left rows at
    equal timestamps, giving the inclusive (>=) as-of semantics that
    matches DuckDB's ``ASOF JOIN ... ON l >= r``.

    Cost: one shuffle of |L|+|R| rows on ``partition_cols`` (or a
    single-partition sort when unkeyed — use keys at scale; a keyed
    as-of over a 100 TB fact table shuffles once, never a range cross
    join). Ties on ``right_ts`` within a partition are resolved by the
    last ``right_cols`` value in sort order — pass unique timestamps
    (or a tie-breaking ordering column) for deterministic output.
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    # partition columns must carry the RIGHT side's real values (they
    # exist under the same name in both frames) — nulling them would
    # strand every right row in the NULL partition and keyed as-of
    # would never match
    r_tagged = right.select(
        *[
            F.col(c).alias(c)
            if c in partition_cols
            else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if partition_cols
        else Window.orderBy("__ts", "__is_left").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    carried = unioned.select(
        *lcols,
        "__is_left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")


def cumulative_slice(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """Deterministic first-n slice — the engine's replacement for the
    reference's order-unstable ``limit(n)`` cumulative slices
    (``spark_model_trainer.py:210-226``, flaw acknowledged at ``:226``).

    ``row_number`` over a total order on ``order_col`` makes model-k's
    "first k/5 of the data" reproducible across runs and partitionings.
    Cost: one global sort-shuffle — acceptable for training-data prep;
    at 100 TB prefer a pre-sorted/bucketed layout on ``order_col``.
    """
    w = Window.orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
