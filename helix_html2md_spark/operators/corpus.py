"""Corpus-level term statistics and deterministic sampling for
training-data pipelines.

Beyond-reference surfaces (the reference is a single-document service;
cross-corpus statistics have no counterpart there — SURVEY §2B "joins:
none"), both expressed entirely in native Spark SQL and exactly
DuckDB-oracle-able:

* ``tfidf_top_terms`` — per-document top-k terms by TF-IDF.  The idf is
  QUANTIZED to an integer (``floor(1000 * n_docs / df)``) so the score
  is exact integer arithmetic: float ``ln()`` is not bit-portable
  across engines (Java Math.log vs libm differ in the last ulp), and a
  cross-engine contract must not rank on it.  Scale shape: one explode
  -> map-side-combined (doc_id, term) count, a term-keyed join of the
  doc-frequency table (uniform md5-like term distribution, no skew
  hotspot beyond natural Zipf heads, which AQE skew-join handles), and
  a per-document window for the top-k — the window key is doc_id, so
  partitions are bounded by per-doc vocabulary, never corpus size.

* ``hash_sample_stats`` — deterministic hash-threshold corpus sampling
  (the standard mixing/weighting primitive): keep a document iff the
  first two hex chars of ``md5(doc_id)`` sort below a threshold
  (``numerator``/256).  Lowercase-hex string order equals numeric order,
  the predicate is stateless and embarrassingly parallel — ZERO extra
  shuffle at any scale (contrast per-stratum row_number quotas, which
  funnel each stratum through one task) — and the same predicate runs
  verbatim in any engine with md5().  Emits per-language sampled/total
  counts in ONE map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import (
    STOPWORDS, char_count, quantized_idf, token_ngrams, tokens,
)
from .dedup import _PERSISTED


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-``k`` terms: (doc_id, term, tf, df, score, rank).

    score = tf * floor(1000 * n_docs / df), rank dense per doc by
    (score desc, term asc) — fully deterministic, integer-exact.
    """
    n_docs = docs.count()  # one long to the driver (like the packing
    # offsets: the standard driver-side scalar of a two-phase plan)
    tf = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # tf feeds BOTH the df aggregation and the scoring join: persist to
    # break the diamond (battery frees it via release_persisted)
    tf = tf.persist()
    _PERSISTED.append(tf)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    # integer div, not float floor: floor(a/b) in float64 can land one
    # off within half an ulp of an integer (the unigram_rank_stats
    # rule); shared helper = the one home of the quantization
    idf_q = quantized_idf(n_docs)
    scored = tf.join(df_t, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * idf_q).cast("long").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _thr(n: int) -> str:
    """2-char threshold string for an n/256 keep rate.  'zz' sorts
    above every lowercase-hex pair (n>=256 keeps everything) and '00'
    sorts at-or-below every pair (n=0 drops everything) — a plain
    f'{256:02x}' would be '100', which loses the 2-char lexicographic
    compare to every hex prefix and silently keeps NOTHING."""
    return "zz" if n >= 256 else f"{n:02x}"


def hash_sample_stats(docs: DataFrame, numerator: int = 64) -> DataFrame:
    """Deterministic ``numerator``/256 corpus sample, summarized per
    language: (lang, n_total, n_sampled, chars_sampled).

    The keep predicate is a pure function of doc_id — re-running the
    job, at any parallelism, on any engine, samples the identical set
    (north-rule determinism for resumable pipelines).
    """
    if not 0 < numerator <= 256:
        raise ValueError("numerator must be in 1..256")
    keep = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        < F.lit(_thr(numerator))
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_sampled"),
            F.sum(
                F.when(keep, F.col("n_chars")).otherwise(0)
            ).alias("chars_sampled"),
        )
        .orderBy("lang")
    )


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, int],
    default: int = 256,
) -> DataFrame:
    """Deterministic per-source mixture sampling (Pile/ROOTS-style
    corpus weighting): source ``s`` keeps ``weights[s]``/256 of its
    documents via the same stateless md5-prefix threshold as
    :func:`hash_sample_stats` — a weight of 256 keeps every row, 0
    drops the source entirely, unlisted sources use ``default``.

    Zero shuffle: the per-row predicate is a map lookup + string
    compare in the scan stage, so re-mixing 100 TB is a pure filter
    pass, and the SAME rows are kept at any parallelism, on any engine,
    on every re-run (resumable-pipeline determinism).
    """
    for s, n in weights.items():
        if not 0 <= n <= 256:
            raise ValueError(f"weight for {s!r} must be in 0..256")
    if not 0 <= default <= 256:
        raise ValueError("default weight must be in 0..256")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    if not weights:
        # empty dict = "default rate for every source" — create_map()
        # with zero args types as map<void,void> and fails analysis
        return docs.filter(prefix < F.lit(_thr(default)))
    m = F.create_map(
        *[
            F.lit(x)
            for s, n in sorted(weights.items())
            for x in (s, _thr(n))
        ]
    )
    keep = prefix < F.coalesce(m[F.col("source")], F.lit(_thr(default)))
    return docs.filter(keep)


# ---------------------------------------------------------------------------
# Gopher/MassiveText-style repetition + quality rules
# ---------------------------------------------------------------------------

# Gopher repetition-filter thresholds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", Table A1), expressed in integer parts
# per million so the keep decision is bit-portable across engines
GOPHER_TOP2_MAX_PPM = 200_000   # top 2-gram may cover <= 20% of chars
GOPHER_DUP5_MAX_PPM = 150_000   # duplicated 5-grams <= 15% of chars
GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MEAN_LEN_MILLI = (3_000, 10_000)  # mean token length in [3, 10]
GOPHER_MIN_STOP_DISTINCT = 2    # >= 2 distinct stop words present


# shared guarded windower (functions/text.py): the descending-sequence
# guard lives in ONE place for both gram coverage here and dedup's
# window hashing
_ngrams = token_ngrams


def _gram_coverage(toks, n: int) -> "F.Column":
    """struct(top, dup) Gopher coverage over a token-array column via a
    SINGLE in-row fold over the sorted gram array.

    ``top`` = coverage of the most frequent ``n``-gram (cnt * length,
    lexicographic (cnt, cov) max — the tie-break of the old
    aggregation form; NULL for gram-less docs, its join-miss twin);
    ``dup`` = summed coverage of duplicated (cnt >= 2) grams.  All
    longs — the ppm arithmetic multiplies by 1e6, past int32.

    Shape rules (both measured, both load-bearing):

    * zero shuffle — gram frequencies are per-document, so the explode
      -> groupBy(doc_id, gram) -> groupBy -> join-back plumbing (two
      corpus-sized gram shuffles) is unnecessary; a native array_sort
      plus one linear fold reads the identical (cnt, cov) multiset off
      the row.
    * the fold's lambda touches ONLY its accumulator and element —
      never an outer array.  Lambda bodies get no common-subexpression
      elimination, and filter-pushdown INLINES projected expressions
      into consumer predicates (e.g. ``verdicts.filter("keep")``), so
      any ``element_at(<staged array>, i)`` inside a lambda turns into
      a full re-sort per element after inlining (a measured hang, not
      a slowdown).  With the fold, the sorted input is the aggregate's
      argument and evaluates exactly once wherever the expression
      lands.
    """
    srt = F.array_sort(_ngrams(toks, n))
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("cnt"),
        F.lit(None).cast("long").alias("bcnt"),
        F.lit(None).cast("long").alias("bcov"),
        zero.alias("dup"),
    )

    def _close(acc):
        """Fold the open run into (bcnt, bcov, dup)."""
        cov = acc["cnt"] * F.length(acc["prev"])
        better = (
            acc["bcnt"].isNull()
            | (acc["cnt"] > acc["bcnt"])
            | ((acc["cnt"] == acc["bcnt"]) & (cov > acc["bcov"]))
        )
        return (
            F.when(better, acc["cnt"]).otherwise(acc["bcnt"]),
            F.when(better, cov).otherwise(acc["bcov"]),
            acc["dup"]
            + F.when(acc["cnt"] >= 2, cov).otherwise(zero),
        )

    def merge(acc, x):
        nbcnt, nbcov, ndup = _close(acc)
        one = F.lit(1).cast("long")
        return (
            F.when(
                (acc["cnt"] > 0) & (x == acc["prev"]),
                F.struct(
                    acc["prev"].alias("prev"),
                    (acc["cnt"] + 1).alias("cnt"),
                    acc["bcnt"].alias("bcnt"),
                    acc["bcov"].alias("bcov"),
                    acc["dup"].alias("dup"),
                ),
            )
            .when(
                acc["cnt"] == 0,
                F.struct(
                    x.alias("prev"),
                    one.alias("cnt"),
                    acc["bcnt"].alias("bcnt"),
                    acc["bcov"].alias("bcov"),
                    acc["dup"].alias("dup"),
                ),
            )
            .otherwise(
                F.struct(
                    x.alias("prev"),
                    one.alias("cnt"),
                    nbcnt.alias("bcnt"),
                    nbcov.alias("bcov"),
                    ndup.alias("dup"),
                )
            )
        )

    def finish(acc):
        nbcnt, nbcov, ndup = _close(acc)
        return F.struct(
            F.when(acc["cnt"] > 0, nbcov)
            .otherwise(acc["bcov"])
            .alias("top"),
            F.when(acc["cnt"] > 0, ndup)
            .otherwise(acc["dup"])
            .alias("dup"),
        )

    return F.aggregate(srt, init, merge, finish)


def _token_base(docs: DataFrame) -> DataFrame:
    """Persisted ``(doc_id, toks, n_chars)`` base: tokenize ONCE and
    materialize, so repeated references to ``toks`` read a stored array
    rather than inlining the tokenizer per reference.  The persist
    stays even though the round-6 per-row coverage rewrite made the
    filter itself single-pass: in COMPOSED pipelines the verdict table
    is consumed via semi-joins whose downstream stages re-execute their
    whole unpersisted prefix (each stage references its input twice —
    data side and keep-id side — so re-execution compounds per stage);
    the cache is the memoization point that keeps that affordable."""
    # NULL text (a failed extraction) coalesces to '' HERE, once, so
    # every downstream rule sees 0 tokens / 0 chars instead of NULL
    # conditions that F.when() silently falls through (a null-text doc
    # must be judged, not waved past the quality gate) — the zeros
    # contract every sibling operator documents
    txt = F.coalesce(F.col("text"), F.lit(""))
    base = docs.select(
        "doc_id",
        tokens(txt).alias("toks"),
        char_count(txt).alias("n_chars"),
    )
    base = base.persist()
    _PERSISTED.append(base)
    return base


def repetition_stats(
    docs: DataFrame,
    top_n: int = 2,
    dup_n: int = 5,
    _base: DataFrame | None = None,
) -> DataFrame:
    """Per-document Gopher-style repetition metrics, integer-exact.

    Output: ``doc_id, n_tokens, n_chars, top_gram_ppm, dup_gram_ppm``.

    * ``top_gram_ppm`` — characters covered by the most frequent
      ``top_n``-gram (count x gram length) as parts-per-million of the
      document's characters.  Tie-break among equally-frequent grams:
      the one with the LARGEST coverage (max over ``struct(cnt, cov)``
      — deterministic in any engine with lexicographic struct compare).
    * ``dup_gram_ppm`` — characters covered by ALL duplicated
      ``dup_n``-grams (count >= 2), counted per occurrence.  Documented
      approximation of Gopher's overlap-aware accounting: overlapping
      occurrences double-count, so the value is clamped to 1e6.

    Everything is integer arithmetic (``div``, not float division): the
    keep decisions built on these numbers must be bit-portable across
    engines (see tfidf's quantized idf for the same discipline).

    Scale shape (round 6): ZERO shuffle.  Gram frequencies are a
    PER-DOCUMENT statistic, so they never needed the explode ->
    groupBy(doc_id, gram) -> groupBy(doc_id) -> join-back plumbing the
    first implementation used (two full gram-table shuffles plus two
    doc_id joins): each row sorts its own gram array and reads run
    lengths off the sorted array.  Work per row is one O(g log g)
    native array sort + three linear passes — bounded by document
    length, embarrassingly parallel, and the gram text never leaves
    the row.
    """
    base = _base if _base is not None else _token_base(docs)
    toks = F.col("toks")
    ppm = "least(1000000, (1000000 * coalesce({c}, 0)) div greatest(n_chars, 1))"
    return base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        "n_chars",
        _gram_coverage(toks, top_n)["top"].alias("top_chars"),
        _gram_coverage(toks, dup_n)["dup"].alias("dup_chars"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.expr(ppm.format(c="top_chars")).alias("top_gram_ppm"),
        F.expr(ppm.format(c="dup_chars")).alias("dup_gram_ppm"),
    )


def gopher_filter(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText document-quality rules as a keep/drop verdict.

    Output: ``doc_id, n_tokens, mean_len_milli, n_stop_distinct,
    top_gram_ppm, dup_gram_ppm, keep, reason`` — ``reason`` is the
    FIRST failed rule in a fixed priority order ('' when kept), so the
    verdict is reproducible row-for-row in any engine (every input is
    an integer; no float ever reaches a comparison).

    Rules (Rae et al. 2021, Table A1, adapted to integer milli/ppm):
    token count in [40, 100k]; mean token length in [3, 10]; at least
    2 distinct stop words; top 2-gram covers <= 20% of characters;
    duplicated 5-grams cover <= 15% of characters.
    """
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    # ONE tokenize for the whole filter, and since round 6 ZERO
    # shuffle end-to-end: the repetition metrics are per-row run-length
    # reads (coverage_cols), so the whole verdict is a single
    # projection over the materialized token column — no gram explode,
    # no doc_id joins, no persisted intermediate.  (The base is still
    # _token_base so the stored `toks` array is computed once per row;
    # its persist is released by the caller as before.)
    base = _token_base(docs)
    toks = F.col("toks")
    ppm = "least(1000000, (1000000 * coalesce({c}, 0)) div greatest(n_chars, 1))"
    j = base.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        "n_chars",
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("sum_tok_chars"),
        F.size(
            F.array_distinct(
                F.filter(toks, lambda w: F.array_contains(stop, w))
            )
        ).alias("n_stop_distinct"),
        _gram_coverage(toks, 2)["top"].alias("top_chars"),
        _gram_coverage(toks, 5)["dup"].alias("dup_chars"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_stop_distinct",
        F.expr(ppm.format(c="top_chars")).alias("top_gram_ppm"),
        F.expr(ppm.format(c="dup_chars")).alias("dup_gram_ppm"),
        F.expr(
            "(1000 * sum_tok_chars) div greatest(n_tokens, 1)"
        ).alias("mean_len_milli"),
    )
    rules = [
        ("too_few_tokens", F.col("n_tokens") < GOPHER_MIN_TOKENS),
        ("too_many_tokens", F.col("n_tokens") > GOPHER_MAX_TOKENS),
        (
            "mean_len_out_of_range",
            (F.col("mean_len_milli") < GOPHER_MEAN_LEN_MILLI[0])
            | (F.col("mean_len_milli") > GOPHER_MEAN_LEN_MILLI[1]),
        ),
        (
            "too_few_stopwords",
            F.col("n_stop_distinct") < GOPHER_MIN_STOP_DISTINCT,
        ),
        ("top_ngram_repetition", F.col("top_gram_ppm") > GOPHER_TOP2_MAX_PPM),
        ("dup_ngram_repetition", F.col("dup_gram_ppm") > GOPHER_DUP5_MAX_PPM),
    ]
    reason = F.lit("")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return j.select(
        "doc_id",
        "n_tokens",
        "mean_len_milli",
        "n_stop_distinct",
        "top_gram_ppm",
        "dup_gram_ppm",
        (reason == "").alias("keep"),
        reason.alias("reason"),
    )


def _rank_top_tokens(counts: DataFrame, k: int) -> DataFrame:
    """Rank a (token, n) counts table: keep the top-``k`` by
    (count desc, token asc) and attach rank 1..k with the SAME
    ordering.  The single home of the deterministic-rank contract —
    ``token_vocab`` and ``unigram_rank_stats``'s internal build both
    call it, so a vocab built by one is always rank-compatible with
    the other.  The limit compiles to TakeOrderedAndProject
    (per-partition heaps + a k-row merge); the window runs over the k
    survivors only."""
    top = counts.orderBy(F.desc("n"), "token").limit(k)
    w = Window.orderBy(F.desc("n"), "token")
    return top.withColumn("rank", F.row_number().over(w))


def token_vocab(docs: DataFrame, k: int = 4096) -> DataFrame:
    """Top-``k`` corpus vocabulary: (token, n, rank), rank 1..k by
    (count desc, token asc) — fully deterministic (count ties break on
    the token string, so two builds and two engines agree rank-for-rank).

    Scale shape: explode -> ONE map-side-combinable token count (Zipf
    head tokens are hot keys, but partial aggregation collapses them
    executor-side before the shuffle), then a global top-k that
    compiles to TakeOrderedAndProject (per-partition heaps + a k-row
    merge, never a full sort shuffle).  The rank window runs over the
    k surviving rows only — a single bounded task, NOT a corpus-sized
    single-partition window.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    return _rank_top_tokens(counts, k)


def unigram_rank_stats(
    docs: DataFrame, vocab_size: int = 4096, vocab: DataFrame | None = None
) -> DataFrame:
    """Per-document unigram familiarity score — the rank-based stand-in
    for CCNet-style LM-perplexity quality filtering (Wenzek et al. 2020
    score documents by a KenLM over the target corpus; the published
    lexical-frequency literature uses Zipf word ranks the same way).
    A document made of high-frequency (low-rank) vocabulary scores low
    = "ordinary language"; gibberish, boilerplate codes, and
    wrong-language text land many out-of-vocabulary tokens and a high
    mean rank.

    Everything is INTEGER arithmetic — ranks instead of log
    probabilities, because float ``ln()`` is not bit-portable across
    engines (the same reasoning as ``tfidf_top_terms``'s quantized
    idf) — so the output is exactly DuckDB-oracle-able:

    * ``n_tokens``, ``n_oov`` — token/OOV counts (OOV = not in the
      top-``vocab_size`` corpus vocabulary; OOV tokens carry rank
      ``vocab_size + 1``, or ``max(vocab.rank) + 1`` when a pre-built
      ``vocab`` is supplied — ``vocab_size`` is ignored then, so the
      OOV rank can never drift from the table actually joined);
    * ``oov_ppm``   = (1_000_000 * n_oov) div n_tokens;
    * ``mean_rank_milli`` = (1000 * sum-of-ranks) div n_tokens.

    Integer ``div`` on bigints, never float floor: ``floor(a / b)`` in
    float64 can land one off across the floor boundary for a/b within
    half an ulp of an integer (denominators up to ~1e6 make that
    reachable), and a hash contract cannot carry that risk.

    One row per input document (empty/whitespace/null-text docs report
    zeros), the ``dedup_segments`` contract.  Scale shape: token table
    persisted once and shared by the vocab build and the scoring pass
    (diamond broken, registered for battery release); the vocab joins
    as a BROADCAST (<= vocab_size rows); the only shuffles are the
    vocab count and the per-doc re-aggregation, both map-side
    combinable on uniform keys.  Pass ``vocab`` to score against a
    pre-built (possibly persisted) vocabulary table — the serving
    pattern when one reference corpus scores many candidate shards.
    """
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    if vocab is None:
        tok = tok.persist()
        _PERSISTED.append(tok)
        counts = tok.groupBy("token").agg(F.count("*").alias("n"))
        vocab = _rank_top_tokens(counts, vocab_size)
        oov_rank = vocab_size + 1
    else:
        # Persist: the supplied vocab feeds the max-rank collect AND
        # the broadcast join — unpersisted, a vocab built from a
        # reference corpus would re-run that corpus's scan + count
        # twice per call (the file's diamond discipline)
        vocab = vocab.persist()
        _PERSISTED.append(vocab)
        # The OOV rank must come from the SUPPLIED vocab, not the
        # vocab_size parameter: a pre-built vocab of k=1000 rows with
        # the default vocab_size=4096 would otherwise score OOV tokens
        # rank 4097 (4x-inflating mean_rank_milli), and a k > 4096
        # vocab would make a real in-vocab rank collide with the OOV
        # rank.  max(rank) is a bounded collect over a k-row table.
        max_rank = vocab.agg(F.max("rank").alias("m")).collect()[0]["m"]
        if max_rank is None:
            raise ValueError("supplied vocab table is empty")
        oov_rank = int(max_rank) + 1
    per = (
        tok.join(F.broadcast(vocab.select("token", "rank")), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("rank").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
            F.sum(
                F.coalesce(F.col("rank").cast("long"), F.lit(oov_rank))
            ).alias("_sum_rank"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce("_sum_rank", F.lit(0)).alias("_sum_rank"),
        )
        .withColumn(
            "oov_ppm",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN 0"
                " ELSE (1000000 * n_oov) div n_tokens END"
            ),
        )
        .withColumn(
            "mean_rank_milli",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN 0"
                " ELSE (1000 * _sum_rank) div n_tokens END"
            ),
        )
        .drop("_sum_rank")
    )
