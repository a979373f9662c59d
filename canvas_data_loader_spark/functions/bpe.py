"""Deterministic in-repo byte-pair-merge tokenizer.

Real training pipelines count tokens with a trained BPE vocabulary
(GPT-2/tiktoken-style); the whitespace proxy used by q111/q112/q114
under-counts long words and over-counts punctuation. This module
provides a small, fully deterministic stand-in with the same *shape*
as trained BPE — a pre-tokenizer split plus an ordered merge table
greedily applied rank by rank — built so that the EXACT same
algorithm runs in three places:

1. JVM-side Spark SQL expressions (the scale path: whole-stage
   codegen, no Python workers) — ``count_expr_spark``;
2. DuckDB oracle SQL — ``count_expr_duckdb`` (same generated
   REPLACE chain, so Spark vs oracle is bit-exact by construction);
3. an Arrow-batched pandas UDF — ``bpe_token_count_udf`` — the lane
   a real trained tokenizer (e.g. tiktoken with its public vocab)
   would plug into at scale; pinned equal to the expression path in
   pytest (tests/test_operators.py::TestBpeTokens).

Algorithm (all three implementations):
- lowercase; pre-tokenize into letter runs ``[a-z]+``, digit runs
  ``[0-9]+``, and non-alnum-non-space runs (ASCII classes on purpose:
  identical semantics in Java regex, RE2 and Python ``re``);
- digit/punct runs count 1 token each;
- each letter run is spelled as space-delimited symbols with leading
  and trailing sentinels (``"the"`` -> ``" t h e "``), then each
  merge rank ``(a, b)`` is applied as one plain left-to-right
  ``REPLACE(" a b ", " ab ")`` pass — the both-side space delimiters
  make a match possible only at true symbol boundaries;
- the run's token count is its final symbol count.

Deliberate simplification vs trained BPE: one replace pass per rank,
so an alternating repeat of the same pair (``"ababab"``) may leave
unmerged residue a later rank would catch. That keeps the encoder a
pure REPLACE chain with identical left-to-right semantics in Spark,
DuckDB and Python — which is what makes the q122 oracle bit-exact —
and costs nothing for token *counting* fidelity at this vocab size.

MERGES is an original hand-ordered table over common English pairs
(public-knowledge bigram frequency), each later rank only referencing
symbols earlier ranks can produce.
"""

from __future__ import annotations

# Ordered merge ranks. Each entry (a, b) -> symbol a+b. Later ranks may
# reference symbols produced by earlier ones (e.g. "th" + "e").
MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("a", "t"),
    ("e", "n"),
    ("o", "r"),
    ("e", "s"),
    ("s", "t"),
    ("a", "r"),
    ("o", "u"),
    ("a", "l"),
    ("e", "d"),
    ("i", "s"),
    ("i", "t"),
    ("t", "o"),
    ("l", "e"),
    ("c", "h"),
    ("s", "e"),
    ("h", "e"),
    ("w", "h"),
    ("o", "f"),
    ("a", "s"),
    ("th", "e"),
    ("an", "d"),
    ("in", "g"),
    ("i", "on"),
    ("t", "er"),
    ("at", "e"),
    ("ou", "t"),
    ("er", "s"),
    ("or", "t"),
    ("ab", "le"),
    ("w", "in"),
    ("r", "ow"),
    ("c", "ol"),
    ("u", "m"),
    ("p", "ar"),
]


def _replace_chain(spaced_sql: str) -> str:
    """Wrap a spaced-symbols SQL expression in the ordered REPLACE
    chain. REPLACE(s, from, to) has identical left-to-right
    non-overlapping semantics in Spark SQL and DuckDB."""
    expr = spaced_sql
    for a, b in MERGES:
        expr = f"REPLACE({expr}, ' {a} {b} ', ' {a}{b} ')"
    return expr


def count_expr_spark(col_sql: str) -> str:
    """Spark SQL expression (string, for F.expr) counting BPE-merged
    tokens of a text column. Pure JVM expressions — letter runs via
    regexp_extract_all, per-run merge chain inside transform(), final
    symbol count via split; digit/punct runs count 1 each."""
    spaced = "concat(' ', regexp_replace(w, '(.)', '$1 '))"
    per_word = f"size(split(trim({_replace_chain(spaced)}), ' '))"
    words = "regexp_extract_all(lower({c}), '([a-z]+)', 1)"
    others = (
        "size(regexp_extract_all(lower({c}), '([0-9]+)', 1))"
        " + size(regexp_extract_all(lower({c}), '([^a-z0-9\\\\s]+)', 1))"
    )
    return (
        f"aggregate(transform({words}, w -> cast({per_word} as bigint)),"
        f" 0L, (acc, x) -> acc + x) + {others}"
    ).replace("{c}", col_sql)


def count_expr_duckdb(col_sql: str) -> str:
    """DuckDB SQL expression mirroring count_expr_spark exactly —
    the same generated REPLACE chain, so the two engines agree
    bit-for-bit by construction."""
    spaced = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"
    per_word = f"LEN(STRING_SPLIT(TRIM({_replace_chain(spaced)}), ' '))"
    words = "regexp_extract_all(lower({c}), '([a-z]+)', 1)"
    others = (
        "LEN(regexp_extract_all(lower({c}), '([0-9]+)', 1))"
        " + LEN(regexp_extract_all(lower({c}), '([^a-z0-9\\s]+)', 1))"
    )
    return (
        f"LIST_SUM(LIST_VALUE(0) || LIST_TRANSFORM({words},"
        f" w -> CAST({per_word} AS BIGINT))) + {others}"
    ).replace("{c}", col_sql)


def bpe_token_count_py(text: str) -> int:
    """Pure-Python reference — same algorithm, same replace
    semantics (str.replace is left-to-right non-overlapping)."""
    import re

    if text is None:
        return 0
    low = text.lower()
    total = 0
    # re.ASCII: Python's \s is Unicode-wide by default while Java
    # regex and RE2 treat \s as ASCII — without the flag a U+00A0
    # (non-breaking space) is dropped here but counted as a punct run
    # by the engine paths (verified divergence on "a\xa0b": 2 vs 3)
    for w in re.findall(r"[a-z]+", low, re.ASCII):
        s = " " + " ".join(w) + " "
        for a, b in MERGES:
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
        total += len(s.split())
    total += len(re.findall(r"[0-9]+", low, re.ASCII))
    total += len(re.findall(r"[^a-z0-9\s]+", low, re.ASCII))
    return total


def bpe_token_count_udf():
    """Arrow-batched pandas UDF computing the same count — the lane a
    real trained tokenizer would use at scale (swap the body for
    tiktoken's public vocab; the Spark-side plumbing — schema, batch
    shape, null handling — is what this exercises). Kept OUT of the
    registered q122 plan, which uses the JVM expression path; pinned
    equal to it in pytest."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.pandas.functions import PandasUDFType

    # explicit functionType: this module's `from __future__ import
    # annotations` stringifies type hints, which defeats pandas_udf's
    # signature inference
    @pandas_udf("bigint", PandasUDFType.SCALAR)
    def _count(texts):
        # NULL text stays NULL (matching the expression path, whose
        # aggregate over a NULL array is NULL) — nullable Int64, not a
        # 0-filled int64
        return texts.map(
            lambda t: None if t is None else bpe_token_count_py(t)
        ).astype("Int64")

    return _count
