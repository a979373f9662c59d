"""Text-analysis column expressions (all JVM-side builtins, no UDFs).

Used by operators/textops.py and the dedup family. Everything here is
deliberately expressible in ANSI SQL too, so DuckDB oracles can mirror
each expression for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, trim. (Mirrors common C4/RefinedWeb-style cleaning.)"""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def token_count(c: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = F.col(c) if isinstance(c, str) else c
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the normalized text, as array<string>."""
    return F.split(normalize_text(c), " ")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token-array column.

    ``toks`` should be a *materialized attribute* (project `tokens()`
    into a named column first), not an inline `split(...)` expression:
    a higher-order-function lambda re-evaluates its free subexpressions
    per array element, so an inline split+regexp_replace turns into
    O(tokens²) regex work per row (measured 6.5× slower at sf0.1).
    Returns an empty array when there are fewer than ``n`` tokens.
    Short docs need the explicit guard: ``sequence(1, 0)`` is the
    DESCENDING array ``[1, 0]`` (not empty), and ``slice(toks, 0, n)``
    then raises INVALID_PARAMETER_VALUE.START — so a bare
    ``sequence(1, size-n+1)`` crashes on any doc with < n tokens.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (for Jaccard / MinHash).

    Convenience single-expression form. In anything performance
    sensitive prefer `tokens()` in its own projection followed by
    `shingles_from_tokens` (see that docstring for why).
    """
    return shingles_from_tokens(tokens(c), n)


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is identical across Spark and DuckDB, which makes fingerprints
    oracle-checkable (unlike xxhash64, whose seed differs)."""
    return F.md5(normalize_text(c))


def punct_ratio(c: Column | str) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    c = F.col(c) if isinstance(c, str) else c
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(c: Column | str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are in the given stopword list."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(normalize_text(c), " ")
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )
