"""Text-analysis operators for LLM training-data pipelines (charter
extension; generalizes the reference's only text ops — lowercase
normalization and substring match, ``README.md:92,116-120``).

All hot-path logic is built-in expressions (codegen'd, shuffle-free,
scale linearly with the scan). No Python in the per-row path.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints (stringified
# by `from __future__ import annotations`) resolve against these globals

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram language-ID
#: heuristic. Deterministic and dependency-free; a real pipeline would
#: swap in fastText/CLD3 behind the same operator signature.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


def normalize_text(col: Column | str) -> Column:
    """Canonical normalization: lowercase, collapse whitespace runs,
    THEN trim. Generalizes the README pipeline's lowercase step
    (``README.md:92``).

    Order matters for idempotence (property-tested): ``trim`` removes
    only ASCII spaces, so trimming FIRST leaves non-space whitespace
    (\\r, \\t) to collapse into a leading/trailing space that a second
    pass would then remove — collapse-then-trim is a fixpoint.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count — ``size(split(trim(text), '\\s+'))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def word_occurrences(col: Column | str, word: str) -> Column:
    """Whole-word occurrence count (regexp word boundaries)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(rf"\b{word}\b"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    The exact-dedup key; md5 is identical in Spark and DuckDB so the
    operator is oracle-checkable end-to-end.
    """
    return F.md5(normalize_text(col))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring statistics per document: length, token count,
    chars/token, alpha ratio, whitespace ratio.

    One projection over the scan — no shuffle, no UDF.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_spaces = n_chars - F.length(F.regexp_replace(c, r"\s", ""))
    n_alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    return df.select(
        "*",
        n_chars.alias("stat_chars"),
        n_tokens.alias("stat_tokens"),
        F.round(n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 4).alias(
            "stat_chars_per_token"
        ),
        F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 4).alias(
            "stat_alpha_ratio"
        ),
        F.round(n_spaces.cast("double") / F.greatest(n_chars, F.lit(1)), 4).alias(
            "stat_space_ratio"
        ),
    )


def char_entropy_udf():
    """Arrow-batched scalar Pandas UDF: Shannon entropy (bits) of the
    character distribution of each text — a cheap gibberish/quality
    signal (low: repetitive; high: diverse).

    THE designated escape-hatch shape (SURVEY §2.10): vectorized batch
    in/out over Arrow, no row-at-a-time Python. Body is self-contained
    (local imports only) so cloudpickle ships it by value. Newlines are
    excluded to match the RE2 ``.`` semantics of the SQL oracle.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def entropy(texts: pd.Series) -> pd.Series:
        import math
        from collections import Counter

        def one(t):
            if t is None:
                return 0.0
            chars = [c for c in t if c != "\n"]
            if not chars:
                return 0.0
            n = len(chars)
            return -sum(
                (k / n) * math.log2(k / n) for k in Counter(chars).values()
            )

        return pd.Series([one(t) for t in texts])

    return entropy


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: count whole-word marker hits per language,
    pick the argmax (ties → lexicographically first language, 'und'
    when nothing matches).

    Pure expression composition — builds a score column per language and
    folds them with ``greatest``; stays in codegen and needs no
    shuffle. Swap-in point for a model-based classifier (same
    signature, Pandas UDF) when external libs are available.
    """
    c = F.col(text_col)
    scores = {
        lang: sum(
            (F.regexp_count(c, F.lit(rf"(?:^|\s){w}(?:\s|$)")) for w in words),
            start=F.lit(0),
        )
        for lang, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # Iterate in reverse-sorted order so earlier languages win ties after
    # the final fold.
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return df.withColumn(out_col, pred)
