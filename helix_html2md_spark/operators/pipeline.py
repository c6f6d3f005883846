"""Composed training-corpus cleaning pipeline: quality gates + exact
dedup in one declarative plan (the canonical pre-training data filter).

Everything is JVM-side (array functions + one window), so Catalyst fuses
the quality features into the scan projection and the only shuffle is
the dedup window on the content hash.  At 100 TB: filters run before the
shuffle (map-side row reduction), the window key (md5) is uniformly
distributed — no skew — and the output is a pure row subset, so the plan
is a scan -> project -> filter -> one exchange -> filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import (
    _mean_token_len_t, _nsize, _stopword_ratio_t, _unique_ratio_t, tokens,
)


def clean_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_mean_token_len: float = 12.0,
    min_unique_ratio: float = 0.3,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Quality-gate + exact-dedup filter.

    Keeps documents that (a) pass the heuristic quality gates used by
    large-scale pretraining pipelines (length band, mean token length,
    vocabulary diversity, stopword presence) and (b) are the FIRST
    (min doc_id) copy of their exact content hash.  Returns ONLY the
    surviving rows, carrying the feature values each gate evaluated
    (gated-out documents do not appear; run the feature expressions
    directly for drop-auditing).

    The feature formulas are the shared ones in functions/text.py —
    one Spark-side transcription, kept byte-identical with the DuckDB
    oracles there.
    """
    c = F.col("text")
    t = F.col("_toks")
    # tokenize ONCE: the per-helper text-col form would inline a
    # separate regexp split per feature (see quality_features)
    featured = (
        docs.withColumn("_toks", tokens(c))
        .select(
            # NOT "text": the dedup window below shuffles every
            # surviving row, and the output never reads the document
            # body — carrying it through the exchange multiplied the
            # shuffle by the corpus payload for nothing (guide §2.3:
            # project before the exchange).  content_hash is computed
            # here, before the text column is dropped.
            "doc_id",
            _nsize(t).alias("n_tokens"),
            _mean_token_len_t(t).alias("mean_token_len"),
            _unique_ratio_t(t).alias("unique_ratio"),
            _stopword_ratio_t(t).alias("stopword_ratio"),
            F.md5("text").alias("content_hash"),
        )
    )
    gated = featured.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_token_len") <= max_mean_token_len)
        & (F.col("unique_ratio") >= min_unique_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        gated.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") == 1)
        .select(
            "doc_id",
            "n_tokens",
            "mean_token_len",
            "unique_ratio",
            "stopword_ratio",
            "content_hash",
        )
    )
