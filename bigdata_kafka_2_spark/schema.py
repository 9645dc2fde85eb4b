"""Canonical schemas and schema-conformance semantics.

The reference hand-duplicates its 18-column food schema in four places
(``producer.py:13-19``, ``batch_writer_consumer.py:13-19``,
``spark_model_trainer.py:17-24``, ``api.py:27-48``) and re-implements the
same missing-data policy at every layer: unparseable/missing numerics
become ``0.0``, missing strings become ``"Unknown"``, and a whole missing
column is synthesized as a constant (``spark_model_trainer.py:46-64``,
``producer.py:82-87``, ``batch_writer_consumer.py:51-58``,
``api.py:164``).

Here both are defined ONCE: the schemas as ``StructType`` constants and
the policy as :func:`conform_schema` — a pure DataFrame->DataFrame
transform built from ``try_cast`` / ``coalesce`` / ``lit`` so it stays
inside whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Reference-native food schema (FIXTURES.md §1) ----------------------

#: 17 numeric nutrient features, in the reference's canonical order
#: (``producer.py:13-19``).
FOOD_NUMERIC_COLUMNS: tuple[str, ...] = (
    "Protein-G",
    "Total lipid (fat)-G",
    "Carbohydrate, by difference-G",
    "Energy-KCAL",
    "Sugars, total including NLEA-G",
    "Fiber, total dietary-G",
    "Calcium, Ca-MG",
    "Iron, Fe-MG",
    "Sodium, Na-MG",
    "Vitamin D (D2 + D3)-UG",
    "Cholesterol-MG",
    "Fatty acids, total saturated-G",
    "Potassium, K-MG",
    "Vitamin C, total ascorbic acid-MG",
    "Vitamin B-6-MG",
    "Vitamin B-12-UG",
    "Zinc, Zn-MG",
)

FOOD_DESCRIPTION_COLUMN = "description"

FOOD_SCHEMA = T.StructType(
    [T.StructField(c, T.DoubleType(), True) for c in FOOD_NUMERIC_COLUMNS]
    + [T.StructField(FOOD_DESCRIPTION_COLUMN, T.StringType(), True)]
)

#: README-revision allergen schema (``README.md:63``).
ALLERGEN_SCHEMA = T.StructType(
    [
        T.StructField("fdc_id", T.LongType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("ingredients", T.StringType(), True),
    ]
)

#: Default fill values per Spark type, reproducing the reference's
#: missing-data policy (SURVEY.md §1.2): numerics → 0.0, strings →
#: "Unknown" (``spark_model_trainer.py:51-63``).
NUMERIC_DEFAULT = 0.0
STRING_DEFAULT = "Unknown"

_NUMERIC_TYPES = (
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)


def _default_for(dtype: T.DataType):
    if isinstance(dtype, _NUMERIC_TYPES):
        return F.lit(NUMERIC_DEFAULT).cast(dtype)
    if isinstance(dtype, T.StringType):
        return F.lit(STRING_DEFAULT)
    return F.lit(None).cast(dtype)


def conform_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Conform ``df`` to ``schema`` with the reference's fill semantics.

    For every field in ``schema``, in order:

    - column present  → ``coalesce(try_cast(col AS type), default)`` —
      unparseable values degrade to the default rather than erroring,
      matching the per-cell ``float(raw) or 0.0`` coercion at
      ``producer.py:82-85`` / ``batch_writer_consumer.py:55-58``;
    - column absent   → synthesized constant default, matching
      ``spark_model_trainer.py:50-51,58-60``.

    Columns of ``df`` not named in ``schema`` are dropped (projection,
    ``producer.py:13-19``). The whole transform is built-in expressions —
    Catalyst folds it into the scan stage, and on parquet input the
    projection prunes unneeded columns at the reader.
    """
    cols = []
    existing = {f.name for f in df.schema.fields}
    for field in schema.fields:
        if field.name in existing:
            casted = F.col(field.name).try_cast(field.dataType)
            default = _default_for(field.dataType)
            if isinstance(field.dataType, (T.StringType, *_NUMERIC_TYPES)):
                expr = F.coalesce(casted, default)
            else:
                expr = casted
            cols.append(expr.alias(field.name))
        else:
            cols.append(_default_for(field.dataType).alias(field.name))
    return df.select(*cols)


# --- Driver star-schema table names (TESTDATA.md) -----------------------

STAR_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
