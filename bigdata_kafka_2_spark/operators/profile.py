"""Dataset profiling & data-quality constraint checks (charter
extension — the validation gates a training-data pipeline runs before
and after every curation stage; generalizes the reference's runtime
data-sufficiency guards, ``spark_model_trainer.py:72,95,121,158``).

All single-pass aggregations — no per-column scans, no UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` with min/max rendered as strings so mixed
    column types stack into one frame.

    ONE pass over the data: every statistic for every column is an
    aggregate of the same scan (Spark plans the multiple
    count-distincts via expand — cost ∝ columns, still one scan), and
    the wide 1-row result is unpivoted row-locally. The inventory
    step of a data-quality gate; at 100 TB this is a single
    map-side-combined aggregation.
    """
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(col.isNull().cast("long")).alias(f"__nulls_{c}"),
            F.countDistinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__rows_{c}").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def check_constraints(
    df: DataFrame, rules: Mapping[str, "F.Column"]
) -> DataFrame:
    """Data-quality gate: ``(rule, n_violations, violation_rate)`` for
    named boolean rule columns (True = row passes; NULL counts as a
    violation — a rule must AFFIRM the row).

    One pass: each rule folds to a conditional count over the same
    scan. Compose with a threshold check driver-side (fail the
    pipeline when any rate exceeds budget) — the dbt-test /
    great-expectations shape, in-engine.
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{name}")
        for name, cond in rules.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{name}").alias("n_violations"),
                F.round(F.col(f"__v_{name}") / F.greatest("__n", F.lit(1)), 6).alias(
                    "violation_rate"
                ),
            )
            for name in rules
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def foreign_key_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Child rows whose key has no parent — referential-integrity
    check as a left-anti join (NULL child keys are violations too,
    per the affirm rule). At scale the anti join shuffles on the key
    like any equi-join; AQE broadcasts the parent when it fits.
    """
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(keys, on=child_key, how="left_anti")
