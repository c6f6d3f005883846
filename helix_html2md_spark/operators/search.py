"""Inverted text index: bucketed posting-table build + pruned search.

The text-retrieval counterpart of the persisted IVF index
(similarity.build_ivf_index): a corpus-scale keyword search needs the
scan to touch only the query terms' postings, not the corpus.

* ``build_text_index`` — postings as (term, doc_id, tf) rows written
  partitioned by a 2-hex-char md5 bucket of the term (256 buckets), a
  document-frequency table bucketed the same way, and a 1-row meta
  table with the corpus size.  Posting rows, NOT per-term arrays: a
  stopword's posting list is millions of entries, and a
  ``collect_list`` per term would funnel each hot term through one task
  — rows keep the build a pair of ordinary map-side-combined
  aggregations.
* ``search_text_index`` — tokenize the query driver-side, read ONLY the
  query terms' buckets (the ``bucket IN`` filter lands as a file-level
  PartitionFilter), score documents by the sum of tf * quantized-idf
  (``floor(1000 * n_docs / df)`` — the same integer-exact idf as
  operators/corpus.tfidf_top_terms), and return the top-k with a
  deterministic (score desc, doc_id asc) order.

At 100 TB: build = one explode + two shuffles (term-keyed counts); the
search reads O(sum of the query terms' posting lists) bytes, joins a
handful of df rows broadcast, and aggregates per doc_id.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from ..functions.text import WS_CLASS, quantized_idf, tokens

# the SAME whitespace class the index-side tokenizer uses: Python's
# re \s is Unicode-aware (NBSP etc.) while the JVM tokenizer's explicit
# class is ASCII — a driver-side \s split would desynchronize query
# terms from indexed terms for any Unicode-whitespace content
_WS = re.compile(WS_CLASS + "+")


def _bucket(term_col):
    # 'b' prefix: a partition directory set that happens to be all
    # digit pairs would be type-INFERRED as int on read, and a later
    # letter-bucket filter would crash the ANSI string-to-int cast; a
    # letter prefix pins string inference for every possible corpus
    return F.concat(F.lit("b"), F.substring(F.md5(term_col), 1, 2))


def build_text_index(docs: DataFrame, path: str) -> None:
    """Write the inverted index for a (doc_id, text) table under
    ``path`` (postings/, df/, meta/)."""
    spark = docs.sparkSession
    postings = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = postings.persist()
    from .dedup import _PERSISTED

    _PERSISTED.append(postings)
    # repartition ON the partition column before partitionBy: otherwise
    # every shuffle partition writes a file into every bucket directory
    # (tasks x buckets files — the classic small-files explosion; this
    # build measured 15s instead of 3s at sf0.1 from exactly that)
    (
        postings.withColumn("bucket", _bucket(F.col("term")))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(f"{path}/postings")
    )
    (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("bucket", _bucket(F.col("term")))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(f"{path}/df")
    )
    spark.createDataFrame(
        [(docs.count(),)], "n_docs long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def search_text_index(
    spark, path: str, query: str, k: int = 10
) -> DataFrame:
    """Top-k documents for a whitespace query against a built index."""
    import hashlib

    terms = sorted({t for t in _WS.split(query) if t})
    if not terms:
        raise ValueError("empty query")
    buckets = sorted(
        {
            "b" + hashlib.md5(t.encode("utf-8")).hexdigest()[:2]
            for t in terms
        }
    )
    n_docs = spark.read.parquet(f"{path}/meta").head()["n_docs"]
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    df_t = (
        spark.read.parquet(f"{path}/df")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
    )
    # the shared helper IS the lockstep with corpus.tfidf_top_terms
    idf_q = quantized_idf(n_docs)
    scored = postings.join(F.broadcast(df_t), "term").select(
        "doc_id",
        (F.col("tf") * idf_q).cast("long").alias("_s"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("_s").alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
