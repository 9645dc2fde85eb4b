"""Built-in expression builders.

Reference parity:

- ``try_double`` — the per-cell ``float(raw) or 0.0`` coercion
  (``producer.py:82-85``, ``batch_writer_consumer.py:55-58``, F8) as a
  single codegen'd expression.
- ``contains_term`` — the documented allergen predicate: lowercase
  substring containment (``README.md:116-120,92``, P7/P8).
- ``dot`` / ``l2_norm`` / ``cosine_similarity`` — the vector math behind
  the reference's sklearn cosine KNN (``api.py:119``, §2.8), expressed
  over ``array<float|double>`` columns with ``zip_with`` +
  ``aggregate`` so it runs inside whole-stage codegen instead of a
  Python UDF. At 100 TB this is the difference between a JVM loop per
  row and a per-row Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_double(col: Column | str, default: float = 0.0) -> Column:
    """Parse to double; unparseable/missing → ``default`` (F8 semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(default))


def contains_term(col: Column | str, term: str) -> Column:
    """Case-insensitive substring containment (P7 + P8).

    The README pipeline lowercases ``ingredients`` at process time
    (``README.md:92``) and the API matches a lowercase term
    (``README.md:116-120``); folding both into one predicate keeps it a
    pure expression that Catalyst can push toward the scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).contains(term.lower())


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns — ``zip_with`` multiply +
    ``aggregate`` sum, all JVM-side."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm.

    ``1 - cosine_similarity`` reproduces sklearn's cosine *distance*
    used by the reference's KNN (``api.py:119``).
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


# --- SQL transcriptions (mathfn's paired-builder discipline) -------------
#
# DuckDB's builtin list_cosine_similarity accumulates in ITS OWN order,
# which lands 1 ulp away from Spark's left fold often enough that a
# 4-dp rounding boundary eventually flips (r14: q271 at sf0.01 — two of
# 16k pair sims sat within 1 ulp of x.xxxx5, breaking the hash while
# every smaller-SF mirror stayed green). These builders transcribe
# dot/l2_norm/cosine LITERALLY — list_reduce over a 0.0-prepended
# left fold is the same sequential (acc + x·y) IEEE order as
# F.aggregate's — so both engines produce BIT-IDENTICAL doubles and
# every rounding downstream agrees by construction.


def dot_sql(a: str, b: str) -> str:
    """SQL transcription of :func:`dot` — identical fold order."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * "
        f"CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t)"
    )


def l2_norm_sql(a: str) -> str:
    """SQL transcription of :func:`l2_norm` — identical fold order."""
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform({a}, "
        f"t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), "
        f"(acc, t) -> acc + t))"
    )


def cosine_similarity_sql(a: str, b: str) -> str:
    """SQL transcription of :func:`cosine_similarity` — the same
    guarded ``dot/(|a|·|b|)`` with bit-identical operand order."""
    denom = f"({l2_norm_sql(a)} * {l2_norm_sql(b)})"
    return (
        f"(CASE WHEN {denom} = 0.0 THEN 0.0 "
        f"ELSE {dot_sql(a, b)} / {denom} END)"
    )
