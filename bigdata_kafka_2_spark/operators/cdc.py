"""CDC / upsert operators (charter-adjacent: corpus maintenance for a
training-data lake without a table format).

Without Delta/Iceberg on the classpath, MERGE INTO is emulated with
pure DataFrame ops (the composition the PySpark guide prescribes:
anti-join + union + window):

- :func:`merge_upsert` — last-writer-wins upsert of an updates batch
  into a snapshot.
- :func:`scd2_apply` — slowly-changing-dimension type 2: close current
  versions, append new ones, keep full history with validity windows.

Scale: both are one shuffle on the merge key; with the snapshot stored
bucketed on the key (``io.write_bucketed``) the anti-join side of the
merge is shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str | None = None,
) -> DataFrame:
    """MERGE (upsert) semantics: rows of ``updates`` replace same-key
    rows of ``target``; unmatched target rows survive; duplicate keys
    WITHIN ``updates`` resolve to the highest ``version_col`` (or
    arbitrary-deterministic by the key sort when None).

    Plan: dedupe updates (window top-1 per key) → target anti-join
    updates → union. One shuffle each side on the key.
    """
    keys = list(key_cols)
    if version_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        updates = updates.dropDuplicates(keys)
    survivors = target.join(updates.select(*keys), on=keys, how="left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    current_flag: str = "is_current",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2: ``history`` rows carry (valid_from, valid_to,
    is_current); each update row becomes the new current version of its
    key, closing the previous current version at the update timestamp.

    ``updates`` must carry ``ts_col`` + the business columns; multiple
    updates per key in one batch are applied in timestamp order (each
    closes its predecessor). Unkeyed columns of history/updates must
    match after adding the SCD columns.
    """
    keys = list(key_cols)

    # order update versions per key; each one's valid_to is the next
    # one's timestamp (the last stays open)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    upd = (
        updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w))
        .withColumn(current_flag, F.col(valid_to).isNull())
        .drop(ts_col)
    )

    # close the previously-current history row per updated key at the
    # FIRST update timestamp of that key
    first_upd = updates.groupBy(*keys).agg(F.min(ts_col).alias("__new_ts"))
    closed = (
        history.join(F.broadcast(first_upd), on=keys, how="left")
        .withColumn(
            valid_to,
            F.when(
                F.col(current_flag) & F.col("__new_ts").isNotNull(),
                F.col("__new_ts"),
            ).otherwise(F.col(valid_to)),
        )
        .withColumn(
            current_flag,
            F.when(F.col("__new_ts").isNotNull(), F.lit(False)).otherwise(
                F.col(current_flag)
            ),
        )
        .drop("__new_ts")
    )
    return closed.unionByName(upd.select(*closed.columns))


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    version_col: str = "version",
) -> DataFrame:
    """Apply a CDC changelog (rows tagged ``op`` ∈ {'I','U','D'} with a
    per-key ``version`` order) to a snapshot: for each key the LAST
    change wins — a delete tombstone removes the row, an insert/update
    replaces it; untouched target rows survive.

    The change-data-feed consumer a training-data lake runs to keep a
    snapshot in sync with an upstream OLTP export, without a table
    format on the classpath. Plan: window top-1 per key over changes →
    target anti-join (ALL changed keys, deletes included) → union the
    non-delete finals. One shuffle per side on the key; with the
    snapshot bucketed on the key the anti-join side is shuffle-free.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = target.join(last.select(*keys), on=keys, how="left_anti")
    upserts = last.filter(F.col(op_col) != "D").drop(op_col, version_col)
    return survivors.unionByName(upserts)


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (temporal) join: enrich each fact row with the
    SCD2 dimension version that was valid AT the fact's timestamp —
    ``valid_from <= fact_ts`` and (``valid_to`` IS NULL or ``fact_ts <
    valid_to``). Facts falling in a coverage gap (key churned: its
    last version was closed before the fact) keep NULL dim columns —
    the feature-store correctness rule ("no future leakage, no
    resurrection") for training-data assembly.

    NOT an inequality join: the naive ``ON key AND from <= ts < to``
    plan multiplies every fact by its key's version count and (in
    engines without a range-join optimizer) degenerates to a
    nested-loop. Instead the AS-OF construction: union dim-version
    START events with fact events, one window per key ordered by
    (time, dim-before-fact), and ``last(version_struct,
    ignorenulls=True)`` picks the latest version whose valid_from <=
    fact_ts — ONE shuffle on the key, zero amplification, window
    partitions bounded by per-key row counts (never a global sort).
    ``valid_to`` rides INSIDE the picked struct (an open version's
    NULL valid_to must not make ``last(ignorenulls)`` skip past it);
    the gap rule is applied as a row-local filter on the picked
    struct afterwards.

    Dim columns other than keys/validity are returned for matched
    facts, NULL otherwise, plus ``__matched`` (boolean). A fact at
    exactly ``valid_from`` sees the NEW version (dim events sort
    before fact events at equal time).
    """
    keys = list(on)
    payload = [
        c for c in dim.columns if c not in keys + [valid_from, valid_to]
    ]
    ver_struct = F.struct(
        *[F.col(c) for c in payload], F.col(valid_to).alias("__vt")
    )
    d = dim.select(
        *keys,
        F.col(valid_from).alias("__t"),
        F.lit(0).alias("__src"),
        ver_struct.alias("__ver"),
    )
    f = facts.withColumn("__t", F.col(fact_ts)).withColumn(
        "__src", F.lit(1)
    )
    u = d.unionByName(f, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = F.last("__ver", ignorenulls=True).over(w)
    out = (
        u.withColumn("__picked", picked)
        .filter(F.col("__src") == 1)
        .withColumn(
            "__matched",
            F.col("__picked").isNotNull()
            & (
                F.col("__picked")["__vt"].isNull()
                | (F.col(fact_ts) < F.col("__picked")["__vt"])
            ),
        )
    )
    sel = [c for c in facts.columns] + [
        F.when(F.col("__matched"), F.col("__picked")[c])
        .alias(c)
        for c in payload
    ] + [F.col("__matched")]
    return out.select(*sel)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Table diff between two snapshot versions: one row per key that
    changed, with ``status`` ∈ ('added', 'removed', 'changed') and
    ``changed_cols`` — the comma-joined names (in schema order) of
    compared columns whose values differ (NULL-safe; empty string for
    added/removed). Unchanged keys are dropped.

    The data-lake audit primitive (what Delta's table_changes answers)
    without a table format: ONE full-outer equi-join on the keys and
    row-local NULL-safe comparisons — no window, no sort; with both
    snapshots stored bucketed on the key the join is shuffle-free.
    Scale cost is |old| + |new| regardless of how many rows changed.
    """
    ks = list(keys)
    cols = (
        [c for c in old.columns if c not in ks]
        if compare_cols is None
        else list(compare_cols)
    )
    o = old.select(
        *ks, *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *ks, *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, on=ks, how="full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in cols
    ]
    changed = F.concat_ws(",", *diffs)
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(changed != "", F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *ks,
            "status",
            F.when(F.col("status") == "changed", changed)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
