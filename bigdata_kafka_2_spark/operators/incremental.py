"""Incremental aggregate maintenance (charter extension — the
operational pattern for 100 TB pipelines: never rescan the corpus).

Algebraic aggregates (count / sum / sum-of-squares / min / max) carry
a mergeable STATE: state(A ∪ B) = combine(state(A), state(B)). So a
daily pipeline keeps one small per-key state table, folds each new
batch into it with one outer join, and derives the display metrics
(mean, population variance) row-locally at read time — cost per day
∝ |delta| + |state|, never ∝ |corpus|. Sums are kept as EXACT
DECIMALs of 4-dp-rounded values (the engine's money-sum discipline):
merging is then order- and partitioning-independent, so
``merge(state(old), state(delta))`` is bit-identical to a full
recompute — which is exactly what the q150 oracle checks.

The same algebra is what Spark's own partial aggregation does WITHIN
a job (map-side combine); these operators lift it ACROSS jobs with a
persistable state schema (plain parquet-writable columns, no UDAF
state blobs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Exact-decimal types for the summable state components. (18,4)
#: per-row values square to (37,8) products — inside DECIMAL(38)
#: in both Spark and DuckDB, so every sum is exact in both engines.
_DEC4 = "decimal(18,4)"


def agg_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per-key mergeable aggregate state over ``value_col``:
    (keys..., n, sum4, sumsq8, vmin, vmax).

    ``n`` counts non-NULL values; ``sum4``/``sumsq8`` are exact
    DECIMAL sums of the 4-dp-rounded value and its square — order-
    independent, parquet-persistable. One map-side-combined shuffle.
    """
    v = F.round(F.col(value_col), 4).cast(_DEC4)
    return df.groupBy(*keys).agg(
        F.count(F.col(value_col)).alias("n"),
        F.sum(v).alias("sum4"),
        F.sum(v * v).alias("sumsq8"),
        F.min(F.col(value_col)).alias("vmin"),
        F.max(F.col(value_col)).alias("vmax"),
    )


def merge_agg_states(
    a: DataFrame, b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Combine two state tables: state(A ∪ B) from state(A), state(B).

    One full-outer equi-join on the keys (both sides are per-key
    states — tiny relative to the data they summarize); components
    combine with NULL-absorbing coalesce/least/greatest. Exact: the
    DECIMAL sums make the merge independent of how rows were split
    between the two states.
    """
    ks = list(keys)
    an = a.select(
        *ks,
        F.col("n").alias("__n_a"),
        F.col("sum4").alias("__s_a"),
        F.col("sumsq8").alias("__q_a"),
        F.col("vmin").alias("__mn_a"),
        F.col("vmax").alias("__mx_a"),
    )
    bn = b.select(
        *ks,
        F.col("n").alias("__n_b"),
        F.col("sum4").alias("__s_b"),
        F.col("sumsq8").alias("__q_b"),
        F.col("vmin").alias("__mn_b"),
        F.col("vmax").alias("__mx_b"),
    )
    j = an.join(bn, on=ks, how="full_outer")
    zero = F.lit(0)
    return j.select(
        *ks,
        (F.coalesce("__n_a", zero) + F.coalesce("__n_b", zero)).alias("n"),
        (
            F.coalesce(F.col("__s_a"), F.lit(0).cast(_DEC4))
            + F.coalesce(F.col("__s_b"), F.lit(0).cast(_DEC4))
        ).alias("sum4"),
        # precision-37 operands: (38,8)+(38,8) would silently reduce
        # the scale to 7 (Spark's allowPrecisionLoss addition rule —
        # see relational.global_prefix_sum's docstring)
        (
            F.coalesce(
                F.col("__q_a").cast("decimal(37,8)"),
                F.lit(0).cast("decimal(37,8)"),
            )
            + F.coalesce(
                F.col("__q_b").cast("decimal(37,8)"),
                F.lit(0).cast("decimal(37,8)"),
            )
        ).cast("decimal(38,8)").alias("sumsq8"),
        F.least("__mn_a", "__mn_b").alias("vmin"),
        F.greatest("__mx_a", "__mx_b").alias("vmax"),
    )


def finalize_agg_state(state: DataFrame) -> DataFrame:
    """Row-local derived metrics from a state table: mean and
    population variance (computed in double from the exact decimal
    components — identical inputs give identical IEEE results in any
    engine), alongside the raw components.
    """
    s = F.col("sum4").cast("double")
    q = F.col("sumsq8").cast("double")
    n = F.col("n").cast("double")
    mean = s / n
    var = q / n - mean * mean
    return state.select(
        *[c for c in state.columns if c not in ("sum4", "sumsq8")],
        s.alias("sum4"),
        F.round(mean, 4).alias("mean4"),
        F.round(var, 4).alias("var4"),
    )


def row_digest_column(df: DataFrame, cols: list[str] | None = None):
    """The per-row portable hash behind :func:`dataset_digest`:
    md5_15 over the \\x1f-joined canonical column strings, as a
    DECIMAL(38,0) column (summable without overflow). Shared by the
    batch digest and the streaming digest monitor so both sides of a
    stream-vs-batch verification hash identically."""
    use = cols or df.columns
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in use
        ],
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )


def dataset_digest(df: DataFrame, cols: list[str] | None = None):
    """Order-independent content digest: one row ``(n_rows, digest)``
    with ``digest`` the exact DECIMAL(38,0) SUM of a per-row portable
    hash (md5_15 over the \\x1f-joined canonical column strings, the
    engine's seeded-hash discipline). Because addition commutes, the
    digest is independent of partitioning and row order, and it is
    MERGEABLE — ``digest(A ∪ B) = digest(A) + digest(B)`` for
    disjoint parts — so a migration/copy/compaction verifies
    content equality shard-by-shard without ever sorting or
    shuffling a row: the q150 mergeable-state contract applied to
    integrity checking. (A multiset digest: duplicate rows
    contribute twice; pair with the row count.)

    ``cols`` defaults to every column. Columns must render to
    strings identically across engines — integers, strings,
    booleans, and dates do; raw DOUBLEs do NOT (engine-dependent
    formatting) — round/format them first. NULL encodes as a
    sentinel distinct from the string 'null'. Digest is returned as
    a STRING so the full 38-digit value survives any consumer.

    Plan: one map-side-combined scalar aggregate — scan speed.
    """
    h = row_digest_column(df, cols)
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("digest"),
    )


def erasure_audit(
    tables: "dict[str, tuple[DataFrame, str, list[str]]]",
    subjects: DataFrame,
) -> DataFrame:
    """Right-to-be-forgotten pass with PROOF: given a deletion-request
    list of subject ids and the tables referencing them, one audit row
    per table — ``(table_name, n_before, n_erased, n_after,
    released_digest)`` — where ``released_digest`` is the
    :func:`dataset_digest` content hash of the RELEASED (purged)
    rows. The erasure a training-data lake actually has to run, with
    the artifact a compliance review actually wants: not "we deleted
    some rows" (a count, which a drop+duplicate elsewhere can fake)
    but the exact content digest the post-erasure corpus must hash
    to, re-checkable shard-by-shard forever after (mergeability —
    the q211 contract).

    ``tables``: name → (frame, subject-key column, digest columns —
    same string-rendering rules as :func:`dataset_digest`: no raw
    DOUBLEs). ``subjects``: a one-column frame of ids to erase;
    it is deduplicated and BROADCAST (a deletion request list is
    human-scale; for a billion-id backlog split into batches).

    Plan shape: ONE scan per table — the subject list broadcast-left-
    joins on, and count/erased/digest reduce in a single map-side-
    combined aggregate; no shuffle of table rows anywhere. The purge
    itself is the same join as an anti join: writing the released
    frame is ``df.join(subjects, key, "left_anti")``, and this
    audit's digest equals ``dataset_digest`` of exactly that frame
    (asserted in tests).
    """
    sid_col = subjects.columns[0]
    subj = F.broadcast(
        subjects.select(F.col(sid_col).alias("__sid"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    outs = []
    for name, (df, key_col, cols) in tables.items():
        h = row_digest_column(df, cols)
        j = df.join(subj, df[key_col] == F.col("__sid"), "left")
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("long").alias("n_before"),
                F.coalesce(F.sum("__hit"), F.lit(0))
                .cast("long")
                .alias("n_erased"),
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), h)),
                    F.lit(0).cast("decimal(38,0)"),
                )
                .cast("decimal(38,0)")
                .cast("string")
                .alias("released_digest"),
            ).select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_erased",
                (F.col("n_before") - F.col("n_erased")).alias("n_after"),
                "released_digest",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
