"""PII detection and redaction (charter extension — the scrub pass a
training-data pipeline runs before any corpus ships: find structured
personal identifiers in free text, count them per category for the
release audit, and rewrite the text with typed placeholders).

Everything here is ROW-LOCAL regex work inside whole-stage codegen —
no shuffle, no UDF, scan speed at any corpus size; the per-category
audit is one map-side-combined aggregate on top. Patterns are plain
character-class regexes (no backreferences or lookaround) so they
mean the same thing under Java regex (Spark) and RE2 (DuckDB/the
oracle gate).

The taxonomy is deliberately minimal and structural (emails, North
American dashed phone numbers, dotted IPv4s, SSN-shaped ids) — the
shapes regex can find with near-zero false negatives. Names,
addresses, and free-form identifiers need an NER model, which is the
classifier stage's job (operators/classify), not a regex's; a real
release combines both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: category -> (pattern, placeholder). Order matters for redaction:
#: emails first (their local part may contain digit runs a later
#: pattern would split), then dotted IPv4, then the dashed numeric
#: shapes. Counting scans each pattern independently over the
#: ORIGINAL text, so a token matching two categories counts in both
#: (documented, auditable behavior — the audit is per category, not
#: a partition of the text).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Per-document PII counts: ``(id, n_<category>..., n_pii)`` with
    one ``regexp_count`` per category over the original text and
    ``n_pii`` their sum. Row-local; the plan is a single projection
    inside codegen.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in patterns
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for name, _, _ in patterns:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """The releasable frame: ``text_col`` rewritten with each
    category's matches replaced by its typed placeholder, applied in
    ``patterns`` order (earlier redactions can consume text a later
    pattern would have matched — the order is part of the contract
    and :data:`PII_PATTERNS` puts the most specific shapes first).
    All other columns pass through untouched. Row-local.
    """
    col: Column = F.col(text_col)
    for _, pat, placeholder in patterns:
        col = F.regexp_replace(col, F.lit(pat), F.lit(placeholder))
    return df.withColumn(text_col, col)


def pii_release(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Scan + redact FUSED into one projection — the release pass a
    pipeline actually runs: ``(id, n_pii, redacted)`` where ``n_pii``
    is the per-category count sum over the ORIGINAL text and
    ``redacted`` the placeholder rewrite, both computed in a single
    ``select`` so the plan is one scan with zero Exchange (composing
    :func:`pii_scan` and :func:`pii_redact` as separate frames and
    joining them back on the id would plan two scans plus a shuffle
    join — the exact shape this operator exists to avoid).
    ``keep_cols`` pass through in the same projection (e.g. the
    grouping columns a release audit aggregates by — joining them
    back afterwards would reintroduce the shuffle).
    """
    total: Column | None = None
    for name, pat, _ in patterns:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        total = c if total is None else total + c
    red: Column = F.col(text_col)
    for _, pat, placeholder in patterns:
        red = F.regexp_replace(red, F.lit(pat), F.lit(placeholder))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        total.cast("long").alias("n_pii"),
        red.alias("redacted"),
    )
