"""DSIR-style data selection: hashed n-gram importance scoring.

The recipe of Xie et al. 2023 ("Data Selection for Language Models via
Importance Resampling"): featurize documents as counts over ``B``
hashed n-gram buckets, fit two bag-of-buckets unigram models — one on
the RAW pool, one on the (much smaller) TARGET corpus — and score each
raw document by its log importance weight
``sum_g [ log p_target(bucket(g)) - log p_raw(bucket(g)) ]``.
Documents whose n-gram profile looks like the target score high;
selection keeps the high scorers.

Cross-engine exactness: the bucket hash is the repo-standard md5
prefix (``conv(substr(md5(gram),1,8),16,10) % B`` — DuckDB computes
the identical integer via ``('0x' || substr(md5(g),1,8))::bigint``),
and the per-bucket log ratios are computed ONCE driver-side from the
two collected histograms, quantized to integer milli-nats, and fed to
the engines as literals — float ``ln()`` never runs inside either
engine, the same discipline as ``tfidf_top_terms``'s quantized idf.

Scale shape: each histogram is ONE map-side-combinable groupBy whose
output is bounded by ``B`` (8192 default) — hot buckets collapse
executor-side; only 2×B longs cross to the driver.  Scoring is a pure
per-row fold (n-gram array → bucket array materialized as a column →
``F.aggregate`` with an ``element_at`` lookup into the literal ratio
array, the IVF-PQ LUT idiom) — **zero shuffles, zero Python**, and
selection is a stateless filter on the scored rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import token_ngrams, tokens


def _gram_bucket(gram: Column, buckets: int) -> Column:
    """Bucket id of one n-gram string: first 8 md5 hex chars as an
    integer, mod ``buckets`` (md5 keeps the repo's one cross-engine
    hash; 8 hex chars = 32 bits, far above any sane bucket count)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


def _bucket_arrays(docs: DataFrame, n: int, buckets: int, text_col: str):
    """(doc_id, bkts array<long>) — the hashed n-gram buckets per doc,
    materialized as a COLUMN so downstream lambdas reference a bound
    array, never re-inline the tokenize/hash pipeline per element."""
    return docs.select(
        "doc_id",
        # coalesce: NULL text propagates a NULL array through
        # transform; zeros-for-empty is the one-row-per-doc contract
        F.coalesce(
            F.transform(
                token_ngrams(tokens(F.col(text_col)), n),
                lambda g: _gram_bucket(g, buckets),
            ),
            F.array().cast("array<bigint>"),
        ).alias("bkts"),
    )


def ngram_bucket_counts(
    docs: DataFrame,
    n: int = 2,
    buckets: int = 8192,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, cnt) histogram of hashed n-gram buckets — the
    bag-of-hashed-ngrams model's sufficient statistics.  One explode +
    one map-side-combinable groupBy; output bounded by ``buckets``."""
    return (
        _bucket_arrays(docs, n, buckets, text_col)
        .select(F.explode("bkts").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    n: int = 2,
    buckets: int = 8192,
    text_col: str = "text",
) -> list[int]:
    """Per-bucket importance log ratio, add-one smoothed, quantized to
    integer MILLI-NATS:

    ``lr_b = round(1000 * (ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))))``

    Driver-side over the two collected B-bounded histograms — the only
    place ``ln`` runs, so engine float semantics never touch the
    contract.  Returns a plain list of length ``buckets`` (index =
    bucket id) ready to feed :func:`dsir_scores` — persist it beside a
    selection run the way the IVF indexes persist their codebooks."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if n < 1:
        raise ValueError("n must be >= 1")

    def hist(df: DataFrame) -> tuple[dict[int, int], int]:
        rows = ngram_bucket_counts(df, n, buckets, text_col).collect()
        h = {r["bucket"]: r["cnt"] for r in rows}
        return h, sum(h.values())

    rh, rtot = hist(raw)
    th, ttot = hist(target)
    out = []
    for b in range(buckets):
        lt = math.log((th.get(b, 0) + 1) / (ttot + buckets))
        lr = math.log((rh.get(b, 0) + 1) / (rtot + buckets))
        out.append(round(1000.0 * (lt - lr)))
    return out


def dsir_scores(
    docs: DataFrame,
    log_ratios: list[int],
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance scores against a trained ratio table.

    Output, one row per input document (short/empty/null-text rows
    report zeros): ``doc_id, n_grams, score_milli`` (sum of per-gram
    milli-nat log ratios — the document's log importance weight) and
    ``avg_milli = score_milli div n_grams`` (length-normalized, the
    thresholding quantity — raw sums favor long documents).

    ZERO shuffles and zero Python: the bucket array is a materialized
    column, the score is an ``F.aggregate`` fold whose lambda does one
    ``element_at`` into the constant-folded literal ratio array (the
    IVF-PQ LUT idiom), and the row count/order never changes."""
    if not log_ratios:
        raise ValueError("log_ratios must be non-empty")
    if n < 1:
        # n=0 would yield size+1 EMPTY grams per doc (zero-length
        # slices), all hashing to one bucket — deterministic nonsense
        # returned without error; fail at the driver like training does
        raise ValueError("n must be >= 1")
    buckets = len(log_ratios)
    lut = F.array(*[F.lit(int(v)) for v in log_ratios])
    base = _bucket_arrays(docs, n, buckets, text_col)
    score = F.aggregate(
        "bkts",
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(lut, (b + 1).cast("int")),
    )
    return base.select(
        "doc_id",
        F.size("bkts").alias("n_grams"),
        F.coalesce(score, F.lit(0)).alias("score_milli"),
    ).withColumn(
        "avg_milli",
        F.expr(
            "CASE WHEN n_grams = 0 THEN 0"
            " ELSE score_milli div n_grams END"
        ),
    )


def dsir_select(
    docs: DataFrame,
    log_ratios: list[int],
    min_avg_milli: int = 0,
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose length-normalized importance score clears
    ``min_avg_milli`` — the deterministic thresholding variant of the
    paper's Gumbel-noise resampling (noise-free selection keeps the
    ranking reproducible across engines and runs; docs with no n-grams
    score 0 and pass only if the threshold is <= 0).  Importance
    weights are NOT zero-centered (the smoothing denominators shift
    every bucket by a corpus-dependent constant), so an absolute
    threshold needs calibration — :func:`dsir_select_frac` is the
    keep-the-top-fraction form the paper actually uses.  Returns the
    surviving input rows with all their columns."""
    keep = (
        dsir_scores(docs, log_ratios, n=n, text_col=text_col)
        .filter(F.col("avg_milli") >= min_avg_milli)
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def hist_thresholds(scores, col: str, fracs) -> list | None:
    """Nearest-rank thresholds over a score column via the HISTOGRAM
    idiom (groupBy(col) — rows = distinct integer scores, never a
    corpus sort), best-first with threshold ties ranked UP.  The ONE
    home of the walk: dsir_select_frac and lm.logprob_buckets both
    select on it, so a rank-policy fix (like the _ceil_frac truncation
    one) lands once.  Returns one threshold per fraction, or None for
    an empty/all-NULL score column."""
    from pyspark.sql import functions as _F

    hist = sorted(
        (
            (r[col], r["cnt"])
            for r in scores.filter(_F.col(col).isNotNull())
            .groupBy(col)
            .agg(_F.count("*").alias("cnt"))
            .collect()
        ),
        reverse=True,
    )
    total = sum(c for _v, c in hist)
    if total == 0:
        return None
    out = []
    for frac in fracs:
        k = _ceil_frac(frac, total)
        cum = 0
        threshold = hist[-1][0]
        for v, c in hist:
            cum += c
            if cum >= k:
                threshold = v
                break
        out.append(threshold)
    return out


def _ceil_frac(frac: float, total: int) -> int:
    """ceil(frac * total) in EXACT integer arithmetic: the float
    product overshoots when it rounds up in binary (0.07 * 100 =
    7.000000000000001 -> float ceil 8, one extra rank) — the same
    reason grouped_percentiles ranks via ``(p*n+99) div 100``.  The
    fraction snaps to 1e-9 by TRUNCATION, not rounding: rounding
    overshoots non-terminating fractions the other way (2/3 * 1e9
    rounds UP to 666666667, so ceil(2/3 of 3) came out 3, one extra
    rank again — exactly the bug this helper exists to prevent).
    Floats carry no more user intent than 1e-9 either way; the
    truncated snap can under-rank by one only past ~1e9 rows per
    distinct score, far beyond any collected histogram."""
    num = int(frac * 1_000_000_000)
    return (num * total + 999_999_999) // 1_000_000_000


def dsir_select_frac(
    docs: DataFrame,
    log_ratios: list[int],
    keep_frac: float,
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Keep the top ``keep_frac`` of documents by length-normalized
    importance — the paper's top-k resampling, made deterministic:
    the threshold is the nearest-rank ``keep_frac`` quantile of
    ``avg_milli`` and ALL threshold ties are kept (so the result can
    slightly exceed the fraction, but is identical across runs,
    engines, and parallelism; Gumbel noise would break ties randomly).

    Scale shape: the quantile comes from a ``groupBy(avg_milli)``
    HISTOGRAM (map-side combinable; rows = distinct integer scores, a
    few thousand — never a corpus-wide sort), the scored table is
    persisted across its two consumers (histogram + filter) and
    registered for battery release, and the filter itself is
    stateless."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    from .dedup import _PERSISTED

    scores = dsir_scores(docs, log_ratios, n=n, text_col=text_col)
    scores = scores.persist()
    _PERSISTED.append(scores)
    got = hist_thresholds(scores, "avg_milli", [keep_frac])
    if got is None:
        return docs.filter(F.lit(False))
    keep = scores.filter(F.col("avg_milli") >= got[0]).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
