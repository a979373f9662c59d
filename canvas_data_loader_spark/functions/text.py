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


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (for Jaccard / MinHash).

    Built with transform over a token slice — pure Catalyst, no UDF.
    Returns an empty array when there are fewer than ``n`` tokens.
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(normalize_text(c), " ")
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


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
