"""Text analysis operators for training-data pipelines.

All are single-pass, UDF-free column expressions over the corpus —
embarrassingly parallel, no shuffle (except the optional aggregations),
which is the right shape at 100 TB: these run at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    normalize_text,
    punct_ratio,
    stopword_ratio,
    token_count,
)

# Tiny per-language stopword seed lists for the n-gram/stopword
# language-ID heuristic. Deliberately small + hardcoded: language ID
# here is a deterministic scoring function, not a model.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality statistics.

    Output: (id, n_chars, n_tokens, avg_token_len, punct_ratio,
    digit_ratio, upper_ratio) — the standard quality-filter signals
    (cf. C4/Gopher rules), all as rounded doubles for portability.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    digits = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    uppers = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                F.length(F.regexp_replace(normalize_text(c), " ", ""))
                / n_tokens.cast("double")
            ),
            4,
        ).alias("avg_token_len"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(
            F.when(n_chars == 0, F.lit(0.0)).otherwise(digits / n_chars.cast("double")), 4
        ).alias("digit_ratio"),
        F.round(
            F.when(n_chars == 0, F.lit(0.0)).otherwise(uppers / n_chars.cast("double")), 4
        ).alias("upper_ratio"),
    )


def lang_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-hit-ratio score per language + argmax prediction.

    Deterministic heuristic language ID: score(lang) = fraction of
    tokens in lang's stopword list; predicted = argmax with fixed
    lexicographic tiebreak. Output: (id, score_en, score_es, score_de,
    score_fr, lang_pred).
    """
    cols = [F.col(id_col)]
    for lang, words in LANG_STOPWORDS.items():
        cols.append(F.round(stopword_ratio(text_col, words), 4).alias(f"score_{lang}"))
    out = df.select(*cols)
    # argmax with deterministic tiebreak: langs in fixed order, strictly-
    # greater comparison so the first max wins.
    langs = list(LANG_STOPWORDS)
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        better = F.col(f"score_{lang}") > best
        pred = F.when(better, F.lit(lang)).otherwise(pred)
        best = F.when(better, F.col(f"score_{lang}")).otherwise(best)
    return out.withColumn("lang_pred", pred)


def doc_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, fp): md5-of-normalized-text content fingerprint per doc."""
    return df.select(F.col(id_col), fingerprint(text_col).alias("fp"))


def token_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus token frequency: explode tokens -> count. One shuffle on
    token; map-side partial aggregation keeps it cheap; top skew token
    ('the') is bounded by partial agg."""
    toks = F.split(normalize_text(text_col), " ")
    return (
        df.select(F.explode(toks).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 3,
    hex_prefixes: tuple[str, ...] = ("0",),
) -> DataFrame:
    """Content-defined chunking (LBFS/rsync-style): a chunk boundary
    opens at every token whose rolling ``gram``-gram hash starts with
    one of ``hex_prefixes`` (default: 1/16 of positions -> expected
    16-token chunks). Chunk identity is a function of content alone:
    an edit perturbs only chunks up to the next boundary; everything
    after is md5-identical (pinned in tests/test_operators.py::
    TestCdcChunks) — the invariance dedup storage, embedding caches
    and incremental re-tokenization rely on. One posexplode + one
    per-doc running-sum window + one grouped md5; corpus-linear.
    Output: (id_col, chunk_id, n_tokens, chunk_md5).
    """
    from pyspark.sql import Window

    prefix_pred = " or ".join(
        f"substring(md5(array_join(slice(t, i - {gram - 1}, {gram}), ' ')),"
        f" 1, {len(p)}) = '{p}'"
        for p in hex_prefixes
    )
    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("t")
    )
    tk = (
        toks.filter(F.size("t") >= 1)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(t)), i -> struct("
                    " t[i-1] as w,"
                    f" case when i >= {gram} and ({prefix_pred})"
                    " then 1 else 0 end as b))"
                )
            ).alias("__p", "s"),
        )
        .select(
            id_col,
            (F.col("__p") + 1).alias("i"),
            F.col("s.w").alias("w"),
            F.col("s.b").alias("b"),
        )
    )
    w_cum = Window.partitionBy(id_col).orderBy("i")
    chunked = tk.select(
        id_col, "i", "w", F.sum("b").over(w_cum).alias("cid")
    )
    return (
        chunked.groupBy(id_col, F.col("cid").cast("bigint").alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(array_sort(collect_list(struct(i, w))),"
                        " x -> x.w)"
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )


def winnow_minima(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing window minima (Schleimer/Wilkerson/Aiken, SIGMOD
    2003): 3-gram hashes, min over each sliding window of 4. The
    single source of the fingerprint scheme shared by q132 (per-doc
    fingerprint stats) and q133 (cross-doc overlap pairs) — one
    posexplode + one bounded ROWS window, corpus-linear.
    Output: (id_col, i, n_kg, wmin) for window starts i <= n_kg - 3.
    """
    from pyspark.sql import Window

    from .skew import ensure_scan_parallelism

    # single-row-group inputs scan as ONE task; spread the gram
    # explode + md5 map before it runs (no-op on multi-file inputs)
    df = ensure_scan_parallelism(df)
    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("t")
    )
    kg = (
        toks.filter(F.size("t") >= 3)
        .select(
            id_col,
            (F.size("t") - 2).alias("n_kg"),
            F.posexplode(
                F.expr(
                    "transform(sequence(1, greatest(size(t) - 2, 1)),"
                    " i -> array_join(slice(t, i, 3), ' '))"
                )
            ).alias("__p", "g"),
        )
        .select(
            id_col, (F.col("__p") + 1).alias("i"), "n_kg", F.md5("g").alias("h")
        )
    )
    w = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, 3)
    return kg.select(
        id_col, "i", "n_kg", F.min("h").over(w).alias("wmin")
    ).filter(F.col("i") <= F.col("n_kg") - 3)
