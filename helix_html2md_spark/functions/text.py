"""Text-analysis functions for the large-scale training-data pipeline:
token counting, document fingerprinting, quality scoring, language-ID.

All JVM-side (pyspark.sql.functions only — no Python UDFs), so they stay
inside whole-stage codegen and are SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# shared with the DuckDB oracles: keep the formulas byte-identical
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# ONE whitespace definition, written as an explicit class because the
# \s shorthand silently diverges between engines: Java's default \s is
# [ \t\n\x0B\f\r] while RE2 (DuckDB) EXCLUDES vertical tab \x0B — a
# document containing \x0B would tokenize differently on the two sides
# of the oracle.  Python's re \s is Unicode-aware and differs from BOTH
# (NBSP etc.), so driver-side query tokenization must use this class
# too (operators/search.py).
WS_CLASS = r"[ \t\n\x0B\f\r]"


def tokens(col) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.filter(
        F.split(F.trim(col), WS_CLASS + "+"), lambda w: w != F.lit("")
    )


def _nsize(arr) -> Column:
    """Null-safe size.  Under ANSI-off configs (every Spark 3.x default,
    a common user override on 4.x) ``size(NULL)`` returns -1 instead of
    NULL — silently corrupting counts and ratios for null-text rows
    (-1 tokens shifts pack offsets; ratios become -1.0 where the
    oracles say NULL).  nullif maps the sentinel back: a real array can
    never size to -1, so this is the identity under ANSI."""
    return F.nullif(F.size(arr), F.lit(-1))


def token_count(col) -> Column:
    return _nsize(tokens(col))


def char_count(col) -> Column:
    return F.length(col)


def token_ngrams(toks_col, n: int) -> Column:
    """Token n-grams over a TOKEN-ARRAY column, as space-joined strings.

    The one shared windower (corpus gram coverage and dedup window
    hashing both build on it — one guard to maintain, not two).
    Guarded: ``sequence(0, size-n)`` DESCENDS when ``size < n`` (Spark
    steps -1 toward a smaller stop), fabricating negative slice
    indices — a short document must yield an empty gram array
    instead."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return F.when(
        F.size(toks_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - n),
            lambda i: F.concat_ws(" ", F.slice(toks_col, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprint(col) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (equivalent of a bag-of-words content hash)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(col))), " ")
    )


def _stopword_count_t(toks) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return _nsize(F.filter(toks, lambda w: F.array_contains(stop, w)))


def stopword_count(col) -> Column:
    return _stopword_count_t(tokens(col))


# the three ratio formulas below are transcribed into SQL in the DuckDB
# oracles AND consumed by two operators (quality_features here,
# operators/pipeline.py::clean_corpus) — ONE Spark-side transcription
# each, so the copies can never diverge


def _mean_token_len_t(toks) -> Column:
    return F.round(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )


def mean_token_len(col) -> Column:
    """Mean token length over whitespace tokens, rounded to 6dp."""
    return _mean_token_len_t(tokens(col))


def _stopword_ratio_t(toks) -> Column:
    return F.round(
        _stopword_count_t(toks) / F.greatest(F.size(toks), F.lit(1)), 6
    )


def stopword_ratio(col) -> Column:
    """Stopword-token share, rounded to 6dp."""
    return _stopword_ratio_t(tokens(col))


def _unique_ratio_t(toks) -> Column:
    return F.round(
        _nsize(F.array_distinct(toks))
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )


def unique_ratio(col) -> Column:
    """Distinct-token share (vocabulary diversity), rounded to 6dp."""
    return _unique_ratio_t(tokens(col))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features: token count, mean token length,
    stopword ratio, unique-token ratio.

    Tokenizes ONCE: the features all read a materialized ``_toks``
    column through the array-based ``_t`` internals.  The per-helper
    text-col form inlines a separate regexp split per feature — seven
    full tokenizations per row on the hot path (CollapseProject leaves
    a multiply-referenced non-cheap projection alone, so the shared
    column genuinely computes once)."""
    c = F.col(text_col)
    t = F.col("_toks")
    return (
        df.withColumn("_toks", tokens(c))
        .select(
            "doc_id",
            _nsize(t).alias("n_tokens"),
            char_count(c).alias("n_chars"),
            _mean_token_len_t(t).alias("mean_token_len"),
            _stopword_ratio_t(t).alias("stopword_ratio"),
            _unique_ratio_t(t).alias("unique_ratio"),
        )
    )


def quantized_idf(n_docs: int, df_col: str = "df"):
    """Integer-quantized idf ``(1000 * n_docs) div df`` — the ONE home
    of the cross-engine tfidf quantization (corpus.tfidf_top_terms and
    search.py's ranked serving both call it, so the "same
    integer-exact idf" contract can't drift).  n_docs is cast to
    BIGINT inside the expression: Spark parses a bare 3_000_000
    literal as INT and ``1000 * INT`` overflows int32 at ~2.1M docs
    (ANSI throws, legacy wraps negative) — the 100 TB corpus this
    engine targets is six orders of magnitude past that."""
    if n_docs < 0:
        raise ValueError("n_docs must be >= 0")
    return F.expr(f"(1000 * cast({int(n_docs)} as bigint)) div {df_col}")


# BPE-style pre-tokenizer (GPT-2-ish): contraction suffixes, space-glued
# letter runs, digit runs, punctuation runs, whitespace runs.  Pure
# alternation, no lookaround, explicit whitespace class (see WS_CLASS) —
# identical leftmost-first semantics in Java regex (Spark) and RE2
# (DuckDB), so it is SQL-oracle-checkable.
BPE_PRETOKEN_RE = (
    r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\rA-Za-z0-9]+|"
    + WS_CLASS + "+"
)


def bpe_tokens(col) -> Column:
    """BPE-ish pre-token segments (the units a byte-pair encoder would
    merge within); whitespace runs are kept as segments so that
    concat(tokens) == original text (lossless segmentation)."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_token_count(col) -> Column:
    """Count of non-whitespace BPE pre-tokens (≈ LLM token estimate)."""
    return F.size(
        F.filter(bpe_tokens(col), lambda t: ~t.rlike("^" + WS_CLASS + "+$"))
    )


# DuckDB oracle fragments (must mirror the Spark formulas exactly —
# built FROM the same WS_CLASS constant so they cannot drift)
SQL_TOKENS = (
    "list_filter(str_split_regex(trim({c}), '"
    + WS_CLASS
    + "+'), x -> x <> '')"
)
SQL_STOPWORDS = "['" + "','".join(STOPWORDS) + "']"
