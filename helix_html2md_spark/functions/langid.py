"""Language identification — the n-gram/stopword heuristic layer of the
text-analysis kernel (reference parity target: a training-data pipeline's
langid stage; the classic shape is Cavnar & Trenkle's n-gram profiles, here
reduced to the two signals that survive cross-engine exactness: Unicode
script majorities and per-language stopword hit counts).

Everything is JVM-side (``pyspark.sql.functions`` only — regexp counts,
array filters, struct sort), so detection stays inside whole-stage codegen
and is SQL-oracle-checkable: :func:`sql_lang_id` emits a DuckDB expression
built FROM THE SAME tables below, so the two engines cannot drift.

Two stages:

1. **Script majority.** Per-script code-point counts via
   ``length(text) - length(regexp_replace(text, '[range]+', ''))``.  The
   ranges are embedded as *literal characters* (``chr(0x4E00)``), not
   ``\\uXXXX`` escapes, because Java regex spells escapes ``\\uXXXX`` while
   RE2 wants ``\\x{XXXX}`` — the literal form parses identically in both.
   A script with a strict majority of letter code points decides directly
   (Hangul→ko, Kana-bearing CJK→ja, Han→zh, Cyrillic→ru, Arabic→ar,
   Devanagari→hi, Greek→el).
2. **Latin stopword argmax.** For Latin-majority text, lowercase, strip
   non-letters, whitespace-tokenize, and count *total* hits against each
   language's marker-stopword list.  Winner = max hits, ties broken by
   alphabetical language code (deterministic: sort ``struct(-hits, code)``
   ascending and take the head).  Zero hits everywhere → ``und``.

Null or letterless text → ``und`` (NULL comparisons fall through every
branch in both engines' CASE semantics).

Accuracy caveat, by design: this is a deterministic heuristic for corpus
triage (the Gopher/CCNet-style "keep documents in the target language"
gate), not a trained classifier; ambiguous two-word fragments can
misclassify.  The marker lists are chosen to minimise cross-language
credit (e.g. French gets ``des``/``pas``, not ``que``, which Spanish and
Portuguese share).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import SQL_TOKENS, tokens

# ---------------------------------------------------------------------------
# profiles — the single source of truth for BOTH engines
# ---------------------------------------------------------------------------

def _r(lo: int, hi: int) -> str:
    return chr(lo) + "-" + chr(hi)


# script -> regex character-class body (literal chars, engine-portable)
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z" + _r(0x00C0, 0x024F),
    "han": _r(0x4E00, 0x9FFF),
    "kana": _r(0x3040, 0x30FF),
    "hangul": _r(0xAC00, 0xD7A3),
    "cyrillic": _r(0x0400, 0x04FF),
    "arabic": _r(0x0600, 0x06FF),
    "devanagari": _r(0x0900, 0x097F),
    "greek": _r(0x0370, 0x03FF),
}

# Latin-script marker stopwords.  Ten high-frequency function words per
# language, picked to avoid crediting a *different* language's common
# words (shared entries like es/pt "como" appear in both lists so the
# credit is neutral between them).
LATIN_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "was", "with", "for",
           "this"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit",
           "sich", "auf"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "qui",
           "pas"),
    "es": ("el", "los", "las", "una", "por", "con", "para", "pero",
           "más", "como"),
    "it": ("il", "di", "che", "per", "sono", "della", "anche", "come",
           "gli", "alla"),
    "pt": ("o", "os", "em", "um", "uma", "não", "com", "mais",
           "são", "como"),
    "nl": ("de", "het", "een", "van", "niet", "met", "voor", "dat",
           "zijn", "ook"),
}

# keep-class for the Latin word normalizer: lowercase latin letters
# (`lower()` maps the U+00C0 block into U+00E0-U+00FF; U+0100-U+024F
# alternates case in place, so keep the whole block)
_LATIN_KEEP = "a-z" + _r(0x00DF, 0x024F)


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def _count_class(col, body: str) -> Column:
    return F.length(col) - F.length(
        F.regexp_replace(col, "[" + body + "]+", "")
    )


def script_counts(col) -> Column:
    """Struct of per-script code-point counts (field order =
    SCRIPT_RANGES order; NULL text → NULL fields)."""
    return F.struct(
        *[_count_class(col, body).alias(name)
          for name, body in SCRIPT_RANGES.items()]
    )


def _latin_tokens(col) -> Column:
    # the ONE shared tokenizer (functions/text.py) over the lowercased,
    # letter-only normalization — never a local re-implementation, so a
    # WS_CLASS change can't silently miss this copy
    return tokens(
        F.regexp_replace(F.lower(col), "[^" + _LATIN_KEEP + "]+", " ")
    )


def _best_vote(toks) -> Column:
    """Head of the argmax sort over marker-stopword hit counts: a
    struct(nh, lg) whose nh is MINUS the winner's hits (alphabetical
    tie-break via the struct's second field)."""

    def _hits_in(stop):
        # F.filter treats a second lambda parameter as the element
        # INDEX, so the marker array must be captured by closure
        return F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))

    entries = []
    for code in sorted(LATIN_STOPWORDS):
        hits = _hits_in(F.array(*[F.lit(w) for w in LATIN_STOPWORDS[code]]))
        entries.append(
            F.struct((-hits).alias("nh"), F.lit(code).alias("lg"))
        )
    return F.element_at(F.array_sort(F.array(*entries)), 1)


def _decide(s: dict, latin_vote) -> Column:
    """The CASE ladder over precomputed per-script counts."""
    total = None
    for c in s.values():
        total = c if total is None else total + c
    two = F.lit(2)
    return (
        F.when(s["hangul"] * two > total, F.lit("ko"))
        .when(
            ((s["han"] + s["kana"]) * two > total) & (s["kana"] > 0),
            F.lit("ja"),
        )
        .when(s["han"] * two > total, F.lit("zh"))
        .when(s["cyrillic"] * two > total, F.lit("ru"))
        .when(s["arabic"] * two > total, F.lit("ar"))
        .when(s["devanagari"] * two > total, F.lit("hi"))
        .when(s["greek"] * two > total, F.lit("el"))
        .when(s["latin"] * two > total, latin_vote)
        .otherwise(F.lit("und"))
    )


def lang_id(col) -> Column:
    """Predicted language code (en/de/fr/es/it/pt/nl via stopwords;
    zh/ja/ko/ru/ar/hi/el via script majority; else 'und').

    Convenience single-Column form: every script count is inlined into
    each CASE branch, so the regex passes replicate across the ladder.
    On a hot path use :func:`lang_stats`, which materializes the counts
    once per row."""
    s = {name: _count_class(col, body)
         for name, body in SCRIPT_RANGES.items()}
    best = _best_vote(_latin_tokens(col))
    vote = F.when(best["nh"] < 0, best["lg"]).otherwise(F.lit("und"))
    return _decide(s, vote)


def lang_stats(
    df: DataFrame, text_col: str = "text", keep: tuple = ()
) -> DataFrame:
    """Per-document language prediction: (doc_id, *keep, lang_pred) —
    ``keep`` passes extra input columns through (e.g. a ground-truth
    label for evaluation) without a second scan or join.

    Narrow, shuffle-free, fully code-generated — at 100 TB this is a
    pure map stage that co-travels with whatever scan feeds it.  The
    per-script counts, the Latin token array, and the vote head are
    materialized as intermediate columns so each regex pass runs ONCE
    per row instead of once per CASE branch (CollapseProject leaves
    multiply-referenced non-cheap projections alone — the same sharing
    the quality kernel relies on; plan-asserted in tests)."""
    c = F.col(text_col)
    staged = (
        df.withColumn("_sc", script_counts(c))
        .withColumn("_lt", _latin_tokens(c))
        .withColumn("_best", _best_vote(F.col("_lt")))
    )
    s = {name: F.col("_sc")[name] for name in SCRIPT_RANGES}
    vote = F.when(
        F.col("_best")["nh"] < 0, F.col("_best")["lg"]
    ).otherwise(F.lit("und"))
    return staged.select(
        "doc_id", *keep, _decide(s, vote).alias("lang_pred")
    )


def filter_language(
    df: DataFrame, keep=("en",), text_col: str = "text"
) -> DataFrame:
    """Keep documents whose predicted language is in ``keep`` — the
    CCNet/Gopher pipelines' first gate (monolingual corpora select
    their target language before any quality scoring).  Stateless JVM
    filter; 'und' is NOT kept implicitly — add it to ``keep`` when
    letterless/ambiguous docs should survive.

    Uses the STAGED prediction (script counts / token array / vote head
    as intermediate columns), not the single-Column :func:`lang_id`
    form: inlined, the CASE ladder replicates every regex count across
    its branches and the resulting expression TEXT is large enough
    that, at the base of a long pipeline composition, AQE's per-update
    plan rendering alone can exhaust the driver heap."""
    if not keep:
        raise ValueError("keep must name at least one language code")
    c = F.col(text_col)
    staged = (
        df.withColumn("_sc", script_counts(c))
        .withColumn("_lt", _latin_tokens(c))
        .withColumn("_best", _best_vote(F.col("_lt")))
    )
    s = {name: F.col("_sc")[name] for name in SCRIPT_RANGES}
    vote = F.when(
        F.col("_best")["nh"] < 0, F.col("_best")["lg"]
    ).otherwise(F.lit("und"))
    return (
        staged.filter(
            _decide(s, vote).isin([str(k) for k in keep])
        ).drop("_sc", "_lt", "_best")
    )


# ---------------------------------------------------------------------------
# DuckDB twin (generated from the same tables — cannot drift)
# ---------------------------------------------------------------------------

def _sql_count(expr: str, body: str) -> str:
    # DuckDB regexp_replace replaces only the FIRST match without 'g'
    return (
        f"(length({expr}) - length(regexp_replace({expr}, "
        f"'[{body}]+', '', 'g')))"
    )


def sql_lang_id(expr: str) -> str:
    """DuckDB SQL expression computing exactly :func:`lang_id`."""
    s = {name: _sql_count(expr, body)
         for name, body in SCRIPT_RANGES.items()}
    total = "(" + " + ".join(s.values()) + ")"
    cleaned = (
        f"regexp_replace(lower({expr}), '[^{_LATIN_KEEP}]+', ' ', 'g')"
    )
    toks = SQL_TOKENS.format(c=cleaned)  # text.py's one oracle fragment
    entries = []
    for code in sorted(LATIN_STOPWORDS):
        lst = "['" + "','".join(LATIN_STOPWORDS[code]) + "']"
        hits = f"len(list_filter({toks}, x -> list_contains({lst}, x)))"
        entries.append(f"{{'nh': -{hits}, 'lg': '{code}'}}")
    best = "list_sort([" + ", ".join(entries) + "])[1]"
    latin_vote = (
        f"(CASE WHEN ({best}).nh < 0 THEN ({best}).lg ELSE 'und' END)"
    )
    return (
        "(CASE "
        f"WHEN {s['hangul']} * 2 > {total} THEN 'ko' "
        f"WHEN ({s['han']} + {s['kana']}) * 2 > {total} "
        f"AND {s['kana']} > 0 THEN 'ja' "
        f"WHEN {s['han']} * 2 > {total} THEN 'zh' "
        f"WHEN {s['cyrillic']} * 2 > {total} THEN 'ru' "
        f"WHEN {s['arabic']} * 2 > {total} THEN 'ar' "
        f"WHEN {s['devanagari']} * 2 > {total} THEN 'hi' "
        f"WHEN {s['greek']} * 2 > {total} THEN 'el' "
        f"WHEN {s['latin']} * 2 > {total} THEN {latin_vote} "
        "ELSE 'und' END)"
    )
