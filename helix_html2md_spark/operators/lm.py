"""CCNet-style language-model quality scoring (Wenzek et al. 2019,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): train an n-gram LM on a REFERENCE corpus (CCNet uses Wikipedia),
score every pool document by its average token log-probability, and
keep the head of the distribution — the classic third filter next to
rule-based quality (operators/corpus.gopher_filter) and importance
sampling (operators/dsir).

This implementation is the deterministic Spark-native stand-in for
CCNet's KenLM: an add-alpha-smoothed BIGRAM model.

    p(w | prev) = (c(prev, w) + alpha) / (c(prev) + alpha * V)

Cross-engine exactness (the quantized-idf/DSIR discipline — float
``ln()`` never runs inside an engine): counts are exact integers from
two map-side-combinable groupBys; the log of every probability is
computed ONCE, driver-side in Python, over the DISTINCT (c_bigram,
c_prefix) count pairs actually present in the scored corpus, quantized
to integer milli-nats, and broadcast back as a lookup table.  Scoring
is then pure integer joins + one aggregation.

Scale shape:
* training — tokenize + one explode, two groupBys (bigram, prefix)
  with map-side partial aggregation; output is LM-sized, not
  corpus-sized.
* scoring — one explode of the pool's bigrams, two equi-joins against
  the LM (broadcast by default: a reference LM is typically tiny next
  to the pool; pass ``broadcast_lm=False`` to let AQE plan a shuffle
  join for a huge LM), one broadcast lookup join, one groupBy(doc_id).
* the distinct count-pair collect is bounded by the number of distinct
  (c_bigram, c_prefix) combinations — Zipfian counts keep it tiny
  relative to the LM (guarded by ``max_pairs``; raise it or coarsen
  ``min_count`` if a pathological corpus trips the guard).
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from ..functions.text import token_ngrams, tokens


class BigramLM(NamedTuple):
    """A trained bigram model: exact integer count tables + vocab size.

    ``bigrams``: (prev, w, c_bi) — bigram counts (>= min_count).
    ``prefixes``: (prev, c_prev) — unigram counts of the PREFIX token
    (unpruned: pruning bigrams must not change the denominator).
    ``vocab_size``: distinct token count V of the reference corpus.
    """

    bigrams: DataFrame
    prefixes: DataFrame
    vocab_size: int


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, prev, w) — one row per interior bigram (no BOS/EOS
    markers: a 100 TB pool's documents are long enough that boundary
    tokens are noise, and skipping them keeps the token model exactly
    the shared tokenizer's).  NULL/short texts emit no rows."""
    grams = token_ngrams(tokens(F.col(text_col)), 2)
    pair = F.explode(grams).alias("gram")
    split_at = F.instr(F.col("gram"), " ")
    return docs.select("doc_id", pair).select(
        "doc_id",
        # Column.substr accepts Column positions (F.substring is
        # literal-only on older lines)
        F.col("gram").substr(F.lit(1), split_at - 1).alias("prev"),
        F.col("gram")
        .substr(split_at + 1, F.length("gram") - split_at)
        .alias("w"),
    )


def train_bigram_lm(
    ref_docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> BigramLM:
    """Fit the bigram count model on a reference corpus.

    ``min_count`` prunes rare bigrams from the numerator table (they
    score as unseen, i.e. alpha-mass only); prefix counts stay unpruned
    so the denominator is the true token frequency."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    from .dedup import _PERSISTED

    pairs = _doc_bigrams(ref_docs, text_col)
    bigrams = (
        pairs.groupBy("prev", "w")
        .agg(F.count("*").alias("c_bi"))
        .filter(F.col("c_bi") >= min_count)
    ).persist()
    toks = ref_docs.select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    )
    prefixes = toks.groupBy(F.col("tok").alias("prev")).agg(
        F.count("*").alias("c_prev")
    ).persist()
    # both tables persist (LM-sized, not corpus-sized): every scoring
    # call joins them, and the vocab-size count below doubles as the
    # prefix table's materializing action — without the persist each
    # consumer re-tokenizes the whole reference corpus from scratch
    _PERSISTED.extend([bigrams, prefixes])
    vocab_size = prefixes.count()
    return BigramLM(bigrams, prefixes, int(vocab_size))


# collect guard: distinct (c_bi, c_prev) pairs cross to the driver as
# 16 B rows; Zipfian counts keep real corpora around thousands, and two
# million (32 MB) is far past any non-adversarial case
_MAX_DISTINCT_COUNT_PAIRS = 2_000_000


def logprob_scores(
    docs: DataFrame,
    lm: BigramLM,
    *,
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_lm: bool = True,
    max_pairs: int = _MAX_DISTINCT_COUNT_PAIRS,
) -> DataFrame:
    """Score documents: (doc_id, n_bigrams, sum_logp_milli,
    avg_logp_milli) — average per-bigram log-probability in integer
    milli-nats (higher = more reference-like; CCNet keeps the head).

    One row per input document: token-less/NULL/single-token docs carry
    ``n_bigrams = 0`` and NULL scores (unscoreable — the selection
    helper drops them, CCNet's behavior for empty lines).

    Integer end-to-end inside the engines: the only ``ln`` runs in
    driver Python over the distinct (c_bi, c_prev) pairs, so the same
    scores fall out of any engine/parallelism (milli = round half-even
    of 1000 * ln p, Python's one rounding).
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    if lm.vocab_size <= 0:
        raise ValueError("LM has an empty vocabulary")
    from .dedup import _PERSISTED

    spark = docs.sparkSession
    big = F.broadcast(lm.bigrams) if broadcast_lm else lm.bigrams
    pre = F.broadcast(lm.prefixes) if broadcast_lm else lm.prefixes
    joined = (
        _doc_bigrams(docs, text_col)
        .join(big, ["prev", "w"], "left")
        .join(pre, ["prev"], "left")
        .select(
            "doc_id",
            F.coalesce("c_bi", F.lit(0)).cast("long").alias("cb"),
            F.coalesce("c_prev", F.lit(0)).cast("long").alias("cp"),
        )
    )
    # two consumers (distinct-pair collect + final aggregation): persist
    # so the explode + joins run once; released via release_persisted()
    joined = joined.persist()
    _PERSISTED.append(joined)

    pair_rows = joined.select("cb", "cp").distinct().limit(
        max_pairs + 1
    ).collect()
    if len(pair_rows) > max_pairs:
        raise ValueError(
            f"more than {max_pairs} distinct (c_bigram, c_prefix) pairs; "
            "raise max_pairs or prune the LM (min_count)"
        )
    v = lm.vocab_size
    lut = [
        (
            int(r["cb"]),
            int(r["cp"]),
            round(
                1000.0
                * math.log((r["cb"] + alpha) / (r["cp"] + alpha * v))
            ),
        )
        for r in pair_rows
    ]
    lut_df = F.broadcast(
        spark.createDataFrame(lut, "cb long, cp long, milli long")
    )
    per_doc = (
        joined.join(lut_df, ["cb", "cp"])  # inner: lut covers every pair
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("milli").alias("sum_logp_milli"),
        )
        .withColumn(
            # integer division (truncation toward zero, identical in
            # Spark div and DuckDB // on integers) keeps the average
            # cross-engine exact
            "avg_logp_milli",
            F.expr("sum_logp_milli div n_bigrams"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "sum_logp_milli",
            "avg_logp_milli",
        )
    )


def select_by_logprob(
    docs: DataFrame, scores: DataFrame, min_avg_milli: int
) -> DataFrame:
    """Keep documents whose average log-probability clears the
    threshold; unscoreable docs (NULL avg) are dropped — CCNet's
    head/middle cut is a threshold on exactly this statistic."""
    keep = scores.filter(
        F.col("avg_logp_milli") >= F.lit(int(min_avg_milli))
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")


def save_bigram_lm(lm: BigramLM, path: str) -> None:
    """Persist a trained LM: ``<path>/bigrams``, ``<path>/prefixes``
    (parquet), ``<path>/meta`` (vocab_size).  The CCNet workflow trains
    ONCE on the reference corpus and serves every scoring job from the
    artifact — retraining per run re-pays the reference scan and can
    shift scores under any threshold chosen against the old model."""
    lm.bigrams.write.mode("overwrite").parquet(f"{path}/bigrams")
    lm.prefixes.write.mode("overwrite").parquet(f"{path}/prefixes")
    spark = lm.bigrams.sparkSession
    spark.createDataFrame(
        [(int(lm.vocab_size),)], "vocab_size long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_bigram_lm(spark, path: str) -> BigramLM:
    """Load a :func:`save_bigram_lm` artifact.  The tables come back as
    plain parquet scans — broadcast-joined at scoring time exactly like
    freshly trained ones (no persist: the artifact read IS the cheap
    path)."""
    vocab_size = int(
        spark.read.parquet(f"{path}/meta").collect()[0]["vocab_size"]
    )
    return BigramLM(
        spark.read.parquet(f"{path}/bigrams"),
        spark.read.parquet(f"{path}/prefixes"),
        vocab_size,
    )


def logprob_buckets(
    scores: DataFrame, cuts: tuple = (1.0 / 3.0, 2.0 / 3.0)
) -> DataFrame:
    """CCNet's head/middle/tail split (§4.3 of Wenzek et al. 2019):
    partition scored documents into three quality buckets by
    avg-log-probability quantiles — ``head`` is the most
    reference-like ``cuts[0]`` fraction, ``tail`` the least-like
    remainder, with the paper's use being "train on head+middle, or
    weight buckets differently".

    Deterministic nearest-rank thresholds from a ``groupBy(avg_milli)``
    HISTOGRAM (distinct integer scores to the driver — never a corpus
    sort), threshold ties bucket UP (same keep-ties policy as
    dsir_select_frac, so bucket sizes can slightly exceed their
    fractions but are identical across runs/engines/parallelism).
    Unscoreable docs (NULL avg) get a NULL bucket — they are neither
    head nor tail, and downstream selection already drops them.

    Returns the scores frame plus a ``ppl_bucket`` column.
    """
    if not (0.0 < cuts[0] < cuts[1] < 1.0):
        raise ValueError("cuts must satisfy 0 < cuts[0] < cuts[1] < 1")
    from .dedup import _PERSISTED
    from .dsir import hist_thresholds

    scores = scores.persist()  # histogram + the returned frame
    _PERSISTED.append(scores)
    got = hist_thresholds(scores, "avg_logp_milli", cuts)
    if got is None:
        return scores.withColumn(
            "ppl_bucket", F.lit(None).cast("string")
        )
    t_head, t_mid = got
    a = F.col("avg_logp_milli")
    return scores.withColumn(
        "ppl_bucket",
        F.when(a.isNull(), F.lit(None).cast("string"))
        .when(a >= F.lit(int(t_head)), F.lit("head"))
        .when(a >= F.lit(int(t_mid)), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
