"""Deduplication operators for the training-data pipeline.

* exact dedup: content-hash groupBy (map-side combinable, one shuffle)
* MinHash: per-band min over hashed tokens -> banded signature ->
  bucket-join; expressed entirely in JVM-side array functions so the
  signature computation is shuffle-free and codegen'd
* SimHash: sign-aggregated bit fingerprint from token hashes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens

N_BANDS = 4


def exact_dup_stats(docs: DataFrame) -> DataFrame:
    """Per-source doc counts vs distinct content hashes (exact dedup)."""
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .orderBy("source")
    )


def minhash_signatures(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """MinHash over the token set: band b's hash = min(md5('b:' || token)).

    No shuffle: the whole signature is computed per-row with array
    functions; only the later bucket-join shuffles, keyed by signature.
    """
    toks = F.array_distinct(tokens(F.col("text")))
    bands = [
        F.array_min(
            F.transform(toks, lambda w: F.md5(F.concat(F.lit(f"{b}:"), w)))
        ).alias(f"mh{b}")
        for b in range(n_bands)
    ]
    return docs.select("doc_id", *bands).withColumn(
        "signature", F.concat_ws("|", *[f"mh{b}" for b in range(n_bands)])
    )


def minhash_dup_groups(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """Near-duplicate groups: documents sharing the full banded signature."""
    sig = minhash_signatures(docs, n_bands)
    return (
        sig.groupBy("signature")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("signature")
    )


def minhash_candidate_pairs(docs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """LSH banding: docs sharing ANY band bucket become candidate pairs.

    Classic shingle->minhash->band->bucket-join; the self-join is keyed by
    (band, hash) so only same-bucket rows shuffle together.
    """
    sig = minhash_signatures(docs, n_bands)
    buckets = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"mh{b}").alias("h")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.h")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def shingles(col, k: int = 3):
    """k-gram word shingles as an array column (JVM-side)."""
    toks = tokens(col)
    n = F.size(toks)
    # guard: sequence(1, 0) would DESCEND in Spark; short docs get []
    idx = F.when(
        n >= k, F.sequence(F.lit(1), n - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )


def shingle_minhash_signatures(
    docs: DataFrame, n_bands: int = N_BANDS, k: int = 3
) -> DataFrame:
    """MinHash over 3-gram shingle sets — the classic near-dup signature
    (shingle -> minhash -> band); still shuffle-free per row."""
    sh = F.array_distinct(shingles(F.col("text"), k))
    bands = [
        F.array_min(
            F.transform(sh, lambda w: F.md5(F.concat(F.lit(f"{b}:"), w)))
        ).alias(f"smh{b}")
        for b in range(n_bands)
    ]
    return docs.select("doc_id", *bands)


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token hashes.

    Uses xxhash64 per token; bit b of the fingerprint is 1 when more
    tokens have bit b set than not.
    """
    toks = F.array_distinct(tokens(F.col("text")))
    hashes = F.transform(toks, lambda w: F.xxhash64(w))
    n = F.size(toks)
    bit_cols = []
    for b in range(bits):
        ones = F.size(
            F.filter(
                hashes, lambda h: h.bitwiseAND(F.lit(1 << b)) != F.lit(0)
            )
        )
        bit_cols.append(
            F.when(ones * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
        )
    fp = bit_cols[0]
    for c in bit_cols[1:]:
        fp = fp + c
    return docs.select("doc_id", fp.cast("long").alias("simhash"))
