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

from ..functions.text import tokens
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
    idf_q = F.floor(F.lit(1000.0) * F.lit(float(n_docs)) / F.col("df"))
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
