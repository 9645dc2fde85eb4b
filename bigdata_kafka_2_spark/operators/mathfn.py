"""Cross-engine deterministic special functions.

Neither Spark SQL nor DuckDB ships ``erf``/``erfc`` or an incomplete
gamma, so any p-value that needs the normal (or odd-df chi-square)
tail has historically been out of reach for the oracle gate. This
module closes that with the module-wide DISCOUNT-LITERAL rule: each
function is built from plain ``exp``/``sqrt``/arithmetic with every
coefficient a Python-computed double literal, and comes as a PAIR —
a Spark ``Column`` builder and an SQL-string builder that emit the
SAME expression tree in the SAME IEEE evaluation order — so both
engines compute bit-identical doubles (up to the engines' possible
1-ulp ``exp`` divergence, which the callers' fixed-scale rounding
absorbs; see q262's note in COVERAGE.md for the escalation path).

``erfc`` uses Abramowitz & Stegun 7.1.26 (|error| ≤ 1.5e-7 — far
below the 6-dp scale any caller publishes, and DETERMINISTIC, which
is what the gate actually requires): for x ≥ 0,

    t = 1 / (1 + p·x)
    erfc(x) ≈ (a1·t + a2·t² + a3·t³ + a4·t⁴ + a5·t⁵) · e^(−x²)

evaluated in Horner form. The chi-square survival function composes
the textbook closed forms for BOTH parities of df (no incomplete-
gamma series): even df = 2m uses ``e^(−x/2)·Σ_{i<m}(x/2)^i/i!``;
odd df = 2m+1 uses ``erfc(√(x/2)) + e^(−x/2)·Σ_{j=1..m} c_j·x^(j−1/2)``
with ``c_j = 1/(2^(j−1/2)·Γ(j+1/2))`` as literals.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: A&S 7.1.26 coefficients (published constants).
_ERFC_P = 0.3275911
_ERFC_A = (
    0.254829592,
    -0.284496736,
    1.421413741,
    -1.453152027,
    1.061405429,
)


def erfc_col(x: Column) -> Column:
    """``erfc(x)`` for x ≥ 0 as a Spark Column (A&S 7.1.26 Horner
    form). Callers own the x ≥ 0 contract (use ``abs`` for two-sided
    tails)."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ERFC_P) * x)
    a1, a2, a3, a4, a5 = _ERFC_A
    poly = (
        (((F.lit(a5) * t + F.lit(a4)) * t + F.lit(a3)) * t + F.lit(a2))
        * t
        + F.lit(a1)
    ) * t
    return poly * F.exp(-(x * x))


def erfc_sql(x: str) -> str:
    """The SQL transcription of :func:`erfc_col` — same literals,
    same Horner order. ``x`` should be a short column/expression
    string (it is inlined several times; recomputation is
    deterministic)."""
    t = f"(1.0 / (1.0 + {_ERFC_P!r} * ({x})))"
    a1, a2, a3, a4, a5 = _ERFC_A
    poly = (
        f"((((({a5!r} * {t} + {a4!r}) * {t} + {a3!r}) * {t} "
        f"+ {a2!r}) * {t} + {a1!r}) * {t})"
    )
    return f"({poly} * exp(-(({x}) * ({x}))))"


def _odd_coeffs(max_m: int) -> list[float]:
    """``c_j = 1 / (2^(j-1/2) · Γ(j+1/2))`` for j = 1..max_m."""
    return [
        1.0 / (2 ** (j - 0.5) * math.gamma(j + 0.5))
        for j in range(1, max_m + 1)
    ]


def chi2_sf_col(x: Column, dfree: Column, max_df: int = 16) -> Column:
    """Chi-square survival ``P(X ≥ x)`` as a Spark Column for
    1 ≤ df ≤ ``max_df`` (NULL outside — zero/negative df is a
    degenerate test; larger df would need more series terms than the
    shared-literal transcription stays readable at). ``dfree`` is a
    per-row integer column, so the parity dispatch and the series
    length are ``when`` ladders over it — bounded by ``max_df``,
    independent of data size."""
    half = x / F.lit(2.0)
    # even df = 2k: exp(-x/2) * Σ_{i<k} (x/2)^i / i!
    even_poly = F.lit(1.0)
    fact = 1.0
    pow_t = F.lit(1.0)
    for i in range(1, max_df // 2):
        fact *= i
        pow_t = pow_t * half
        even_poly = F.when(
            dfree >= 2 * (i + 1), even_poly + pow_t / F.lit(fact)
        ).otherwise(even_poly)
    even_sf = F.exp(-half) * even_poly
    # odd df = 2m+1: erfc(sqrt(x/2)) + exp(-x/2) * Σ_{j=1..m} c_j x^(j-1/2)
    max_m = (max_df - 1) // 2
    coeffs = _odd_coeffs(max_m)
    series = F.lit(0.0)
    xpow = F.lit(1.0)  # x^(j-1)
    for j, c in enumerate(coeffs, start=1):
        if j > 1:
            xpow = xpow * x
        series = F.when(
            dfree >= 2 * j + 1, series + F.lit(c) * xpow * F.sqrt(x)
        ).otherwise(series)
    odd_sf = erfc_col(F.sqrt(half)) + F.exp(-half) * series
    return F.when(
        (dfree >= 1) & (dfree <= max_df),
        F.when(dfree % 2 == 0, even_sf).otherwise(odd_sf),
    )


def chi2_sf_sql(x: str, dfree: str, max_df: int = 16) -> str:
    """The SQL transcription of :func:`chi2_sf_col` — same literals,
    same evaluation order, CASE ladders mirroring the ``when``
    ladders. ``x``/``dfree`` should be short column names."""
    # even poly: nested CASE additions in the same order
    even_terms = []
    fact = 1.0
    for i in range(1, max_df // 2):
        fact *= i
        prod = " * ".join([f"(({x}) / 2.0)"] * i)
        even_terms.append(
            f"CASE WHEN {dfree} >= {2 * (i + 1)} "
            f"THEN {prod} / {fact!r} ELSE 0.0 END"
        )
    even_poly = "1.0 + " + " + ".join(even_terms)
    even_sf = f"(exp(-(({x}) / 2.0)) * ({even_poly}))"
    max_m = (max_df - 1) // 2
    coeffs = _odd_coeffs(max_m)
    odd_terms = []
    for j, c in enumerate(coeffs, start=1):
        xpow = " * ".join([f"({x})"] * (j - 1)) if j > 1 else "1.0"
        odd_terms.append(
            f"CASE WHEN {dfree} >= {2 * j + 1} "
            f"THEN {c!r} * ({xpow}) * sqrt({x}) ELSE 0.0 END"
        )
    series = " + ".join(odd_terms) if odd_terms else "0.0"
    odd_sf = (
        f"({erfc_sql(f'sqrt(({x}) / 2.0)')} "
        f"+ exp(-(({x}) / 2.0)) * ({series}))"
    )
    return (
        f"CASE WHEN {dfree} >= 1 AND {dfree} <= {max_df} THEN "
        f"CASE WHEN {dfree} % 2 = 0 THEN {even_sf} ELSE {odd_sf} END "
        "END"
    )


#: Below this λ the 8-term alternating series is useless (every term
#: ≈ 1, the partial sums oscillate) while the TRUE survival is
#: > 0.9972 — so the builders return exactly 1.0 there. At the
#: threshold itself the series is already accurate to ~5e-12
#: (term 9 = e^(−0.32·81)).
_KS_SMALL_LAMBDA = 0.4


def ks_sf_col(lam: Column, terms: int = 8) -> Column:
    """Kolmogorov-distribution survival ``Q(λ) = 2·Σ_{j≥1} (−1)^{j−1}
    e^(−2j²λ²)`` (Kolmogorov 1933; the asymptotic two-sample KS
    p-value when λ folds in the effective sample size), truncated at
    ``terms`` — alternating with super-exponentially shrinking terms,
    so 8 terms bound the truncation error below ~5e-12 for λ ≥ 0.4;
    BELOW ``_KS_SMALL_LAMBDA`` the series converges too slowly to
    truncate (near-1 terms cancel) and the true survival exceeds
    0.9972, so the builders return exactly 1.0 (no p-value consumer
    distinguishes 0.9972+ from 1). Clamped to [0, 1] — the truncated
    alternating sum can poke a hair past 1 near the switch. Built
    from plain exp/arithmetic with ``−2j²`` as Python literals (the
    module's paired-builder rule)."""
    l2 = lam * lam
    s = None
    for j in range(1, terms + 1):
        t = F.exp(F.lit(float(-2 * j * j)) * l2)
        t = t if j % 2 == 1 else -t
        s = t if s is None else s + t
    q = F.lit(2.0) * s
    series = F.least(F.greatest(q, F.lit(0.0)), F.lit(1.0))
    return F.when(
        lam < F.lit(_KS_SMALL_LAMBDA), F.lit(1.0)
    ).otherwise(series)


def ks_sf_sql(lam: str, terms: int = 8) -> str:
    """SQL transcription of :func:`ks_sf_col` — same literals, same
    left-assoc addition order, same small-λ branch and clamp."""
    parts = []
    for j in range(1, terms + 1):
        sign = "" if j % 2 == 1 else "-"
        parts.append(
            f"{sign}exp({float(-2 * j * j)!r} * (({lam}) * ({lam})))"
        )
    series = " + ".join(parts).replace("+ -", "- ")
    clamped = f"least(greatest(2.0 * ({series}), 0.0), 1.0)"
    return (
        f"CASE WHEN ({lam}) < {_KS_SMALL_LAMBDA!r} THEN 1.0 "
        f"ELSE {clamped} END"
    )
